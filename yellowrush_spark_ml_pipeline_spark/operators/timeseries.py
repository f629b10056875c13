"""Time-series resample + gap fill (hypertable-style, batch side).

Sensor/event streams are irregular; training features want a dense,
fixed-step grid per entity. This is the batch counterpart of the
streaming tumbling-window rollup (streaming/windows.py): bucket to the
step grid, aggregate, then *densify* — materialize the missing buckets
per key and carry the last observation forward (LOCF), flagging which
rows are real vs filled.

The grid is generated distributively: per-key [min, max] bucket extents
(a tiny agg) explode through ``sequence()`` executor-side — no driver
loop, no `spark.range` cross join against a global calendar (which would
make every key pay for the global time span; per-key extents keep output
linear in Σ per-key spans). At 100 TB the whole plan is three key-hash
exchanges — bucket agg, grid build (tiny), grid↔agg join — plus one
window pass per key for LOCF, all JVM-side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketize(ts: Column, step_seconds: int) -> Column:
    """Floor a timestamp to its step-grid bucket (truncating division on
    whole seconds — identical arithmetic in any engine)."""
    secs = F.unix_timestamp(ts)
    return F.timestamp_seconds((secs - (secs % F.lit(step_seconds))))


def resample(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    step_seconds: int,
    aggs: dict[str, Column],
) -> DataFrame:
    """Aggregate to a fixed-step grid: one map-side-combining shuffle on
    (keys, bucket). ``aggs`` maps output name → aggregate expression."""
    bucket = bucketize(F.col(ts_col), step_seconds)
    return (
        df.withColumn("bucket", bucket)
        .groupBy(*keys, "bucket")
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )


def gap_fill(
    buckets: DataFrame,
    keys: Sequence[str],
    step_seconds: int,
    value_cols: Sequence[str],
    bucket_col: str = "bucket",
) -> DataFrame:
    """Densify a resampled frame to every step in each key's [min, max]
    extent, LOCF-filling ``value_cols`` and emitting ``is_gap``.

    Scale: the extent agg collapses to one row per key before the
    ``sequence`` explode, so the expensive relation (the dense grid) is
    built executor-side already partitioned by key; the left join back to
    the observed buckets and the LOCF window reuse that key partitioning.
    A key whose span is pathological (years of seconds-grid) shows up as
    an exploded-row skew — bound it upstream by choosing the step, not in
    this operator.
    """
    extents = buckets.groupBy(*keys).agg(
        F.min(bucket_col).alias("_mn"), F.max(bucket_col).alias("_mx")
    )
    grid = extents.select(
        *keys,
        F.explode(
            F.sequence(
                F.col("_mn"), F.col("_mx"),
                F.expr(f"interval {int(step_seconds)} second"),
            )
        ).alias(bucket_col),
    )
    joined = grid.join(buckets, on=[*keys, bucket_col], how="left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    probe = F.col(value_cols[0])
    out = joined.withColumn("is_gap", probe.isNull())
    for c in value_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out
