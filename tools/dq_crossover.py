"""Measure the dq_report scan-fusion crossover (round-9 closure of the r8
stretch ask). SCALE.md (round 8) argued the r7 FULL fusion — every fact
table's column checks AND FK-orphan checks in one scan, parents broadcast
— costs a toy-scale constant and wins from sf1 up. This probe REFUTED
that: the fused shape lost at every measured scale and lost MORE as data
grew, because the "constant" is not constant — the broadcast build is the
PARENT'S DISTINCT KEY SET, and orders/customer are fact-sized parents
whose keys grow linearly with the data (7.5M keys at sf5; billions at
100 TB — an unbounded broadcast and a guaranteed OOM).

Measured (best-of-3, equal warmth, per-scale partitions 32/320/1600,
fresh context per scale, 2026-08-16):

    scale   full_fusion   unfused   hybrid
    sf0.1      1.14        0.92      0.93
    sf1        2.21        1.59      1.66
    sf5        7.19        5.10      5.08

so q_dq_report now ships the HYBRID: column checks fused into one scan
per table (dq_column_checks — the part of the r7 fusion that IS scale-
correct, one fact pass instead of one per constraint), FK orphans as
UNHINTED left-anti joins that shuffle only the key column and let AQE
promote to broadcast exactly when the parent measures small. Plan
contract pinned in tests/test_plans.py::test_dq_report_one_scan_per_fact_table.

Shapes compared (identical six-check output, asserted per scale):

- full_fusion — the r7 shape: dq_fused_table_checks (parents broadcast
  into the fact scan).
- unfused — the pre-r7 shape: one independent aggregate per constraint
  (lineitem scanned three times).
- hybrid — the shipped round-9 shape (entrymod.q_dq_report).

Usage:
    python tools/dq_crossover.py [--shots 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SCALES = [
    ("sf0.1", "/root/testdata/sf0.1", 32),
    ("sf1", None, 320),   # .localdata/sf1, resolved below
    ("sf2", None, 640),   # .localdata/sf2
    ("sf5", None, 1600),  # .localdata/sf5 (optional)
]


def _t(spark, sf_dir: str, name: str):
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def count_if(cond) -> "F.Column":
    return F.coalesce(F.sum(cond.cast("long")), F.lit(0))


def full_fusion(spark, sf_dir: str):
    """The r7 shape: column checks AND FK orphans in one scan per fact
    table, parents broadcast into the scan (the refuted variant — kept
    here so the probe stays reproducible)."""
    from yellowrush_spark_ml_pipeline_spark.operators import aggregates

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cu = _t(spark, sf_dir, "customer")
    ev = _t(spark, sf_dir, "events")
    checks = {
        "lineitem_checks": aggregates.dq_fused_table_checks(
            li.select("l_orderkey", "l_linenumber", "l_quantity"),
            {
                "lineitem_pk_unique": aggregates.pk_duplicates_expr(
                    "l_orderkey", "l_linenumber"
                ),
                "lineitem_qty_in_range": count_if(
                    (F.col("l_quantity") <= 0) | (F.col("l_quantity") > 60)
                ),
            },
            {"lineitem_order_orphans": (o, "l_orderkey", "o_orderkey")},
        ),
        "orders_checks": aggregates.dq_fused_table_checks(
            o.select("o_orderkey", "o_custkey"),
            {
                "orders_pk_unique": aggregates.pk_duplicates_expr(
                    "o_orderkey"
                ),
            },
            {"orders_customer_orphans": (cu, "o_custkey", "c_custkey")},
        ),
        "events_user_not_null": ev.agg(
            count_if(F.col("user_id").isNull()).alias("violations")
        ),
    }
    return aggregates.dq_report(checks)


def unfused(spark, sf_dir: str):
    """The pre-r7 shape: one scan per constraint. Same six checks, same
    output contract, but lineitem is read 3x and orders 2x."""
    from yellowrush_spark_ml_pipeline_spark.operators import aggregates

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cu = _t(spark, sf_dir, "customer")
    ev = _t(spark, sf_dir, "events")
    li3 = li.select("l_orderkey", "l_linenumber", "l_quantity")
    checks = {
        "lineitem_pk_unique": aggregates.pk_duplicates(
            li3, "l_orderkey", "l_linenumber"
        ),
        "lineitem_qty_in_range": li3.agg(
            count_if(
                (F.col("l_quantity") <= 0) | (F.col("l_quantity") > 60)
            ).alias("violations")
        ),
        "lineitem_order_orphans": aggregates.fk_orphans(
            li3, o, "l_orderkey", "o_orderkey"
        ),
        "orders_pk_unique": aggregates.pk_duplicates(
            o.select("o_orderkey"), "o_orderkey"
        ),
        "orders_customer_orphans": aggregates.fk_orphans(
            o.select("o_custkey"), cu, "o_custkey", "c_custkey"
        ),
        "events_user_not_null": ev.agg(
            count_if(F.col("user_id").isNull()).alias("violations")
        ),
    }
    return aggregates.dq_report(checks)


def hybrid(spark, sf_dir: str):
    """The shipped round-9 shape: fused column checks + unhinted
    anti-join orphans (q_dq_report itself)."""
    import __spark_entry__ as entrymod

    return entrymod.q_dq_report(spark, sf_dir)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# back-compat alias: earlier probe scripts imported `fused`
fused = full_fusion


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shots", type=int, default=3)
    args = ap.parse_args()

    from yellowrush_spark_ml_pipeline_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shapes = (
        ("full_fusion", full_fusion),
        ("unfused", unfused),
        ("hybrid", hybrid),
    )
    rows = []
    for tag, d, parts in SCALES:
        sf_dir = d or os.path.join(repo, ".localdata", tag)
        if not os.path.isdir(sf_dir):
            print(f"{tag}: missing ({sf_dir}) — skipped", flush=True)
            continue
        spark = get_spark(f"dq-crossover-{tag}", shuffle_partitions=parts)
        try:
            # Equal-warmth: compile every plan + touch the data once.
            for _, shape in shapes:
                materialize(shape(spark, sf_dir))
            times: dict[str, list[float]] = {n: [] for n, _ in shapes}
            for _ in range(args.shots):
                for name, shape in shapes:
                    t0 = time.perf_counter()
                    materialize(shape(spark, sf_dir))
                    times[name].append(time.perf_counter() - t0)
            # Sanity: all shapes report identical violations.
            ref = sorted(map(tuple, full_fusion(spark, sf_dir).collect()))
            for name, shape in shapes[1:]:
                got = sorted(map(tuple, shape(spark, sf_dir).collect()))
                assert got == ref, f"{name} mismatch at {tag}: {got} vs {ref}"
            rows.append(
                {
                    "scale": tag,
                    "parts": parts,
                    **{n: round(min(ts), 2) for n, ts in times.items()},
                }
            )
            print(json.dumps(rows[-1]), flush=True)
        finally:
            spark.stop()
    print(json.dumps({"crossover_probe": rows}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
