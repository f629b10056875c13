"""Time-window operators over event streams (SURVEY.md §2.12 extension).

The reference has no streaming; these give the engine the standard
event-time surface, written so the SAME transformation works in batch
(DataFrame in) and in Structured Streaming (readStream in) — windowed
aggregation is identical code, and the driver oracle checks the batch path
against SQL.

Scale notes: event-time windows shuffle on (window, keys); watermarks bound
state so a 100 TB/day stream doesn't accumulate unbounded window state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import decimal_sum


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    keys: Sequence[str] = (),
    value_col: str = "value",
) -> DataFrame:
    """Tumbling event-time window: count + exact sum per (window, keys).

    Works unchanged on a streaming DataFrame (add `with_watermark` first).
    """
    return (
        df.groupBy(F.window(F.col(ts_col), duration).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(decimal_sum(F.col(value_col)), 4).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "event_count",
            "value_sum",
        )
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    keys: Sequence[str] = (),
    value_col: str = "value",
) -> DataFrame:
    """Sliding event-time window (each event lands in duration/slide
    windows)."""
    return (
        df.groupBy(F.window(F.col(ts_col), duration, slide).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(decimal_sum(F.col(value_col)), 4).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "event_count",
            "value_sum",
        )
    )


_DURATION_UNITS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _duration_seconds(level: str) -> int:
    qty, unit = level.strip().split()
    return int(qty) * _DURATION_UNITS[unit.lower()]


def hypertable_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    keys: Sequence[str] = (),
    value_col: str = "value",
    levels: Sequence[str] = ("1 hour", "1 day"),
) -> dict[str, DataFrame]:
    """Tiered time-bucket rollups (TimescaleDB-style continuous
    aggregates): raw → levels[0] → levels[1] → …, where every coarser
    tier re-aggregates the PREVIOUS tier's output, not the raw table.

    At 100 TB this is the whole point: the daily rollup reads the hourly
    aggregate (≈ |keys|·24 rows/day), not the raw events. Counts re-sum
    exactly; value sums stay exact through tiers because each tier's
    decimal sum casts to double only at 4-decimal precision, which
    round-trips losslessly back into decimal at the next tier — so
    `daily(hourly(raw)) == daily(raw)` bit-for-bit (oracle-checked).

    Returns {level: DataFrame(window_start, *keys, event_count,
    value_sum)}. Each level's frame is lazy; persist intermediate tiers
    when materializing several.

    Levels must NEST (each must be an exact multiple of the previous):
    re-aggregating a finer tier's window START into a non-multiple width
    silently assigns boundary-straddling buckets to the wrong coarse
    bucket, so non-nesting levels are rejected up front."""
    secs = [_duration_seconds(lv) for lv in levels]
    for finer, coarser, f_lv, c_lv in zip(secs, secs[1:], levels, levels[1:]):
        if coarser % finer != 0:
            raise ValueError(
                f"hypertable levels must nest: {c_lv!r} is not a multiple "
                f"of {f_lv!r} — tier re-aggregation would misassign "
                "boundary-straddling buckets"
            )
    out: dict[str, DataFrame] = {}
    prev: DataFrame | None = None
    for level in levels:
        if prev is None:
            agg = (
                df.groupBy(F.window(F.col(ts_col), level).alias("w"), *keys)
                .agg(
                    F.count(F.lit(1)).alias("event_count"),
                    decimal_sum(F.col(value_col)).alias("value_sum"),
                )
            )
        else:
            agg = (
                prev.groupBy(F.window(F.col("window_start"), level).alias("w"), *keys)
                .agg(
                    F.sum("event_count").alias("event_count"),
                    decimal_sum(F.col("value_sum")).alias("value_sum"),
                )
            )
        prev = agg.select(
            F.col("w.start").alias("window_start"), *keys, "event_count", "value_sum"
        )
        out[level] = prev
    return out


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: int = 30,
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Batch sessionization: a session breaks when the gap to the previous
    event of the same user exceeds `gap_minutes`. Session id = cumulative
    count of breaks per user (lag + running sum — two window passes over
    ONE shuffle on user_id).

    ``tiebreak_col`` must be a per-user-unique column for deterministic
    session ids when timestamps collide; pass ``None`` if `ts_col` is
    already unique per user (nondeterministic ordering otherwise).

    Streaming equivalent: `F.session_window(ts, gap)` groupBy — same
    semantics, state-store backed; see `session_window_agg`."""
    order_cols = [F.col(ts_col)]
    if tiebreak_col is not None:
        order_cols.append(F.col(tiebreak_col))
    w_order = Window.partitionBy(user_col).orderBy(*order_cols)
    gap_sec = gap_minutes * 60
    prev_ts = F.lag(F.col(ts_col)).over(w_order)
    is_break = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap_sec),
        1,
    ).otherwise(0)
    return df.withColumn("_brk", is_break).withColumn(
        "session_id",
        F.sum("_brk").over(
            w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("_brk")


def session_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    value_col: str = "value",
) -> DataFrame:
    """Session-window aggregate via Spark's native session_window — valid
    for batch AND streaming (state-store sessions with watermark)."""
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(decimal_sum(F.col(value_col)), 4).alias("value_sum"),
        )
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "event_count",
            "value_sum",
        )
    )


def streaming_window_agg(
    spark,
    source_path: str,
    schema,
    ts_col: str = "ts",
    duration: str = "10 minutes",
    watermark: str = "30 minutes",
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
):
    """True Structured Streaming variant: file-source readStream →
    watermark → tumbling window agg. Returns the streaming DataFrame;
    caller attaches a sink (`writeStream`). Late rows beyond the watermark
    are dropped and state is GC'd — bounded memory at any scale."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_path)
        .withWatermark(ts_col, watermark)
    )
    return (
        stream.groupBy(F.window(F.col(ts_col), duration).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(value_col).alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), *keys, "event_count", "value_sum")
    )
