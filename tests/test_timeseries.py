"""Resample + gap-fill (operators/timeseries.py): grid density, LOCF
semantics, gap flags, and plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from yellowrush_spark_ml_pipeline_spark.operators import timeseries


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def test_gap_fill_densifies_and_locf(spark):
    """Key 1 observes hours 0, 3 → grid is 0,1,2,3 with LOCF through the
    hole; key 2 is a single point (one row, no gaps)."""
    rows = [
        (1, _ts(1, 0), 10.0),
        (1, _ts(1, 0), 30.0),  # same bucket → avg 20
        (1, _ts(1, 3), 40.0),
        (2, _ts(1, 5), 7.0),
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    b = timeseries.resample(
        df, keys=["k"], ts_col="ts", step_seconds=3600,
        aggs={"avg_v": F.avg("v")},
    )
    out = timeseries.gap_fill(b, keys=["k"], step_seconds=3600, value_cols=["avg_v"])
    k1 = out.filter("k = 1").orderBy("bucket").collect()
    assert [r["bucket"].hour for r in k1] == [0, 1, 2, 3]
    assert [r["avg_v"] for r in k1] == [20.0, 20.0, 20.0, 40.0]
    assert [r["is_gap"] for r in k1] == [False, True, True, False]
    k2 = out.filter("k = 2").collect()
    assert len(k2) == 1 and not k2[0]["is_gap"]


def test_gap_fill_row_count_is_extent(spark):
    """Per key, output rows == (max_bucket - min_bucket)/step + 1 exactly
    (generate the contract, don't trust the sample)."""
    rows = [(k, _ts(1 + 2 * k), float(k)) for k in range(5)] + [
        (k, _ts(1 + 2 * k + k % 3), float(k) + 1) for k in range(5)
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    b = timeseries.resample(
        df, keys=["k"], ts_col="ts", step_seconds=86400, aggs={"avg_v": F.avg("v")}
    )
    out = timeseries.gap_fill(b, keys=["k"], step_seconds=86400, value_cols=["avg_v"])
    got = {r["k"]: r["n"] for r in out.groupBy("k").agg(F.count("*").alias("n")).collect()}
    # per-key day spans: k observes days (1+2k) and (1+2k + k%3)
    expect = {k: k % 3 + 1 for k in range(5)}
    assert got == expect


def test_bucketize_grid_alignment(spark):
    """Buckets land on exact step multiples of the epoch regardless of
    sub-step offset."""
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 7, 59, 59),), (dt.datetime(2024, 1, 1, 8, 0, 0),)],
        "ts timestamp",
    )
    out = df.select(timeseries.bucketize(F.col("ts"), 21600).alias("b")).collect()
    assert out[0]["b"] == dt.datetime(2024, 1, 1, 6, 0, 0)
    assert out[1]["b"] == dt.datetime(2024, 1, 1, 6, 0, 0)


def test_gap_fill_plan_jvm_only(spark, sf_oracle):
    """No Python eval anywhere in the plan; the explode-built grid joins
    the bucket agg without a cartesian."""
    from yellowrush_spark_ml_pipeline_spark.sources import load_table

    ev = load_table(spark, sf_oracle, "events")
    b = timeseries.resample(
        ev, keys=["user_id"], ts_col="ts", step_seconds=21600,
        aggs={"avg_v": F.avg("value")},
    )
    out = timeseries.gap_fill(b, keys=["user_id"], step_seconds=21600, value_cols=["avg_v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------- seasonal_decompose


def test_seasonal_decompose_recovers_planted_daily_pattern(spark):
    """Flat base load + planted hour-12 spike repeated every day: the
    decomposition must put the spike into the SEASONAL component (same
    phase every day) with near-flat residuals, and v must always equal
    trend + seasonal + residual up to rounding."""
    import datetime as dt

    from yellowrush_spark_ml_pipeline_spark.operators.timeseries import (
        seasonal_decompose,
    )

    rows = []
    eid = 0
    for day in range(6):
        for hour in range(24):
            ts = dt.datetime(2024, 1, 1 + day, hour, 30)
            val = 100.0 + (50.0 if hour == 12 else 0.0)
            rows.append((eid, ts, val))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = seasonal_decompose(
        df, "ts", "value", step_seconds=3600, period=24, trend_half_window=12
    ).collect()
    assert len(out) == 144
    by_hour = {}
    for r in out:
        assert abs(r.v - (r.trend + r.seasonal + r.residual)) < 2e-6
        by_hour.setdefault(r.bucket.hour, []).append(r.seasonal)
    # the seasonal component concentrates at hour 12 and is ~constant
    # within each phase (one seasonal value per phase by construction)
    assert len(set(by_hour[12])) == 1 and len(set(by_hour[3])) == 1
    assert by_hour[12][0] > 40
    assert all(v < 5 for v in by_hour[3])
    # interior residuals are small (edge buckets see partial trend windows)
    interior = [r for r in out if dt.datetime(2024, 1, 2) <= r.bucket <= dt.datetime(2024, 1, 5)]
    assert interior and all(abs(r.residual) < 10 for r in interior)
