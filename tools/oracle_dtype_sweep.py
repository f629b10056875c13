"""Mechanical dtype sweep over every oracle_sql() entry.

Describes each oracle's output schema on DuckDB (LIMIT-0 execution, no data
scanned) and FAILS if any column is tz-aware (TIMESTAMP WITH TIME ZONE).
Spark's toPandas() output is always tz-naive, so a tz-aware oracle column is
a guaranteed driver schema/hash mismatch — round 4's only red row
(seasonal_decompose, the one oracle that used DuckDB ``to_timestamp()``)
was exactly this class. Keep the check automated so the class can't recur.

Usage: python tools/oracle_dtype_sweep.py
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def sweep(sf_dir: str = SF_DIR) -> list[tuple[str, str, str]]:
    """Return [(query, column, dtype)] for every tz-aware oracle column."""
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    offenders: list[tuple[str, str, str]] = []
    for name, sql in entrymod.oracle_sql().items():
        cur = con.execute(f"DESCRIBE SELECT * FROM ({sql}) LIMIT 0").fetchall()
        for col_name, col_type, *_ in cur:
            if "WITH TIME ZONE" in col_type.upper() or col_type.upper() in (
                "TIMESTAMPTZ",
                "TIMETZ",
            ):
                offenders.append((name, col_name, col_type))
    return offenders


def main() -> int:
    offenders = sweep()
    if offenders:
        for q, c, t in offenders:
            print(f"TZ-AWARE ORACLE COLUMN: {q}.{c} is {t}")
        print(f"dtype sweep FAILED: {len(offenders)} tz-aware columns")
        return 1
    print("dtype sweep OK: no tz-aware oracle columns")
    return 0


if __name__ == "__main__":
    sys.exit(main())
