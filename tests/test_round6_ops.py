"""Direct semantic tests for the round-6 operators — hand-computed
known answers and planted behaviors the registry oracle can't pin (the
oracle proves Spark==DuckDB; these prove both equal the MATH)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from yellowrush_spark_ml_pipeline_spark.operators import (
    aggregates,
    layout,
    sketches,
    timeseries,
)


def _md5_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_hll_registers_match_python_reference(spark):
    """Register index / payload / rho reproduce a pure-Python md5 HLL —
    pins the hash contract independently of both engines."""
    vals = [str(i) for i in range(200)]
    df = spark.createDataFrame([Row(g="a", v=v) for v in vals])
    got = {
        r["register"]: r["max_rho"]
        for r in sketches.hll_registers(df, ["g"], "v").collect()
    }
    want: dict[int, int] = {}
    for v in vals:
        h = _md5_hash60(v)
        reg, w = h % sketches.HLL_M, h // sketches.HLL_M
        if w == 0:
            rho = 53
        else:
            rho = (w & -w).bit_length()  # trailing zeros + 1
        want[reg] = max(want.get(reg, 0), rho)
    assert got == want


def test_hll_estimate_within_band_and_linear_branch(spark):
    """n=2000 distinct -> raw estimator within 4 sigma (~26% for m=256);
    n=100 -> linear-counting branch, which is typically within ~2%."""
    big = spark.createDataFrame([Row(g="big", v=str(i)) for i in range(2000)])
    small = spark.createDataFrame(
        [Row(g="small", v=str(i)) for i in range(100)]
    )
    out = {
        r["g"]: r
        for r in sketches.hll_distinct(
            big.unionByName(small), ["g"], "v"
        ).collect()
    }
    est_big = out["big"]["hll_est_milli"] / 1000.0
    assert abs(est_big - 2000) / 2000 < 0.26
    est_small = out["small"]["hll_est_milli"] / 1000.0
    assert out["small"]["n_nonzero"] < sketches.HLL_M  # linear branch armed
    assert abs(est_small - 100) / 100 < 0.10
    assert out["big"]["exact_distinct"] == 2000


def test_hll_registers_merge_across_unions(spark):
    """Sketch mergeability: registers(A union B) == re-max of
    registers(A) union registers(B)."""
    a = spark.createDataFrame([Row(g="x", v=str(i)) for i in range(300)])
    b = spark.createDataFrame(
        [Row(g="x", v=str(i)) for i in range(150, 450)]
    )
    direct = {
        (r["register"],): r["max_rho"]
        for r in sketches.hll_registers(
            a.unionByName(b), ["g"], "v"
        ).collect()
    }
    merged_df = (
        sketches.hll_registers(a, ["g"], "v")
        .unionByName(sketches.hll_registers(b, ["g"], "v"))
        .groupBy("g", "register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    merged = {(r["register"],): r["max_rho"] for r in merged_df.collect()}
    assert direct == merged


def test_bitmap_activity_hand_computed(spark):
    rows = [
        # entity 0: days 0, 2, 2 (dup), 5 -> 3 active days
        Row(user_id=0, ts="2024-01-01 10:00:00"),
        Row(user_id=0, ts="2024-01-03 10:00:00"),
        Row(user_id=0, ts="2024-01-03 23:00:00"),
        Row(user_id=0, ts="2024-01-06 01:00:00"),
        # entity 1: day 0 only
        Row(user_id=1, ts="2024-01-01 09:00:00"),
        # entity 3 (same cohort as 1 with mod 2): day 70 -> filtered out
        Row(user_id=3, ts="2024-03-15 09:00:00"),
        # entity 2: days 0..3 -> 4 active days
        *[Row(user_id=2, ts=f"2024-01-0{d} 12:00:00") for d in (1, 2, 3, 4)],
    ]
    df = spark.createDataFrame(rows).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {
        r["cohort"]: r
        for r in sketches.bitmap_activity(
            df, "user_id", "ts", "2024-01-01", cohort_mod=2
        ).collect()
    }
    assert out[0]["n_entities"] == 2  # users 0 and 2
    assert out[0]["total_active_days"] == 7  # 3 + 4
    assert out[0]["max_active_days"] == 4
    assert out[0]["n_patterns"] == 2
    assert out[1]["n_entities"] == 1  # user 1 only; user 3 out of window
    assert out[1]["total_active_days"] == 1


def test_salted_aggregate_equals_plain_groupby(spark):
    df = spark.createDataFrame(
        [Row(k="hot", i=i, x=i % 7) for i in range(1000)]
        + [Row(k="cold", i=i, x=1) for i in range(10)]
    )
    got = {
        r["k"]: (r["n_rows"], r["x_sum"])
        for r in aggregates.salted_aggregate(
            df, "k", F.col("i"), 16, {"x_sum": F.sum("x")}
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
        .collect()
    }
    assert got == want


def test_salted_aggregate_plan_has_two_stage_shape(spark):
    """The salted rewrite must actually produce two aggregation stages
    keyed differently (key+salt, then key) — not collapse back into one."""
    df = spark.createDataFrame([Row(k="a", i=i, x=1) for i in range(100)])
    plan = (
        aggregates.salted_aggregate(
            df, "k", F.col("i"), 8, {"x_sum": F.sum("x")}
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.lower().count("hashaggregate") >= 4  # 2 stages x partial+final


def test_zone_maps_and_prune_summary(spark):
    rows = [
        Row(eid=i, ts=f"2024-01-{(i // 4) + 1:02d} 00:00:00", u=i % 3)
        for i in range(16)
    ]
    df = spark.createDataFrame(rows).select(
        F.col("eid"), F.col("ts").cast("timestamp").alias("ts"), F.col("u")
    )
    zones = layout.zone_map_stats(df, "eid", 4, "ts", "u")
    z = {r["bucket"]: r for r in zones.collect()}
    assert set(z) == {0, 1, 2, 3}
    assert all(z[b]["n_rows"] == 4 and z[b]["ndv"] == 3 for b in z)
    assert z[0]["zone_width_days"] == 0  # 4 rows, same day each bucket
    s = layout.zone_prune_summary(zones, "2024-01-03").collect()[0]
    assert s["n_zones"] == 4
    assert s["n_prunable"] == 2  # buckets 0 (Jan 1) and 1 (Jan 2)
    assert s["rows_skipped"] == 8 and s["rows_total"] == 16


def test_range_window_differs_from_rows_at_gaps(spark):
    """A 2-hour gap must break the trailing-3h range frame — the exact
    case where RANGE and ROWS frames disagree."""
    rows = [
        Row(g="a", ts="2024-01-01 00:30:00", v=1.0),
        Row(g="a", ts="2024-01-01 01:30:00", v=2.0),
        # gap: no 02:xx or 03:xx events
        Row(g="a", ts="2024-01-01 04:30:00", v=4.0),
    ]
    df = spark.createDataFrame(rows).select(
        "g", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = {
        r["bucket_epoch"]: r
        for r in timeseries.range_window_stats(
            df, "g", "ts", "v", 3600, 10800
        ).collect()
    }
    epochs = sorted(out)
    # hour 1 sees hour 0 (within 3h)
    assert out[epochs[1]]["n_trailing"] == 2
    # hour 4: hour 1 is exactly -3h -> INCLUDED by RANGE (closed bound),
    # hour 0 (-4h) is not; a 3-row ROWS frame would have counted all 3
    assert out[epochs[2]]["n_trailing"] == 2
    assert out[epochs[2]]["cents_trailing"] == 600
