"""Differential check of every `queries()` entry against its `oracle_sql()`
DuckDB equivalent — a strict local mirror of the driver's correctness gate
(row count + column names + order-insensitive value comparison).

The driver converts DuckDB results through pandas and hashes EXACT values,
so this test (a) reads the oracle via ``fetchdf()`` to surface pandas dtype
coercions (e.g. HUGEINT→float64, the round-1 failure mode), and (b) compares
floats bit-exactly — any last-ulp drift between engines fails here first.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        # pandas renders NULL in float columns as NaN; the driver hashes
        # through pandas on both engines, so None and NaN must normalize
        # to the same sentinel here too (Spark collect() gives None where
        # fetchdf() gives NaN for the same unmatched left-join row).
        return "NaN"
    if isinstance(v, bool):
        return int(v)
    if hasattr(v, "to_pydatetime"):  # pandas Timestamp
        v = v.to_pydatetime()
    if isinstance(v, dt.datetime):
        v = v.replace(tzinfo=None)
        if v.time() == dt.time(0, 0):  # pandas renders DATE as midnight ts
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar — keep int-ness vs float-ness
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "__float__") and not isinstance(v, (int, float)):  # Decimal
        return float(v)
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(_norm_cell(row[i]) for i in order))
    return sorted(out, key=repr)


def _approx_equal(a, b) -> bool:
    # Exact, type-class-sensitive equality: the driver hashes values, so an
    # int 0 vs float 0.0 (pandas HUGEINT coercion) must FAIL here too.
    if isinstance(a, float) != isinstance(b, float):
        return False
    return a == b


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    assert name in QUERIES, f"oracle_sql has {name} but queries() does not"
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    # Through pandas like the driver: a NULL in an integer column renders
    # the WHOLE column float64 on either engine, so comparing collect()
    # ints against pandas floats would flag spurious type mismatches that
    # the driver's pandas-vs-pandas hash never sees.
    spark_pd = sdf.toPandas()
    spark_rows = [tuple(r) for r in spark_pd.itertuples(index=False, name=None)]

    duck_df = duck.execute(ORACLES[name]).fetchdf()
    duck_cols = list(duck_df.columns)
    duck_rows = [tuple(r) for r in duck_df.itertuples(index=False, name=None)]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    mismatches = []
    for i, (sr, dr) in enumerate(zip(s_norm, d_norm)):
        if not all(_approx_equal(a, b) for a, b in zip(sr, dr)):
            mismatches.append((i, sr, dr))
            if len(mismatches) >= 5:
                break
    assert not mismatches, f"{name}: value mismatches (first 5): {mismatches}"


def test_all_queries_run(spark):
    """Queries without an oracle still must run and return ≥0 rows with a
    stable schema at the oracle SF."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_DIR)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_no_vacuous_oracle_queries():
    """Every oracle-backed query must return ≥1 row in the committed
    mirror snapshot: a 0==0 hash match proves nothing (important_stock
    shipped vacuous at round 5 until this guard — its 1.2% share bar
    excluded every supplier)."""
    import json
    import pathlib

    snap_path = pathlib.Path(__file__).resolve().parents[1] / "MIRROR_LOCAL.json"
    if not snap_path.exists():
        pytest.skip("no MIRROR_LOCAL.json snapshot")
    snap = json.load(open(snap_path))
    vacuous = [
        name
        for name, rec in snap.items()
        if isinstance(rec, dict)
        and rec.get("err") is None
        and rec.get("spark_rows") == 0
    ]
    assert not vacuous, f"oracle queries returning zero rows: {vacuous}"
