"""Batch event-sequence analytics over the ``events`` table: ordered
funnels and cohort retention. Complements the streaming sessionization in
``streaming/windows.py`` (SURVEY.md §2.12) with the two classic offline
event queries a product-analytics engine ships.

Scale posture: every stage keys on ``user_id``. The first aggregation
shuffles once on that key; each subsequent stage joins and re-aggregates
on the SAME key, so Catalyst reuses the hash partitioning and no further
full shuffle of the events table occurs (the `.explain` shows one
Exchange per pass over events, none between join→agg pairs). All outputs
are exact integers — no cross-engine float drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: for each stage k, the number of users who
    performed stages[0..k] in strict timestamp order (each stage strictly
    after the previous one; earliest qualifying occurrence taken —
    standard first-touch funnel semantics).

    One conditional aggregation per stage: pass k joins the per-user
    frontier timestamp from pass k-1 and takes ``min(ts)`` over matching
    later events. With S stages that is S passes over the (filtered)
    events relation, all hash-partitioned on ``user_col`` — for the usual
    3-5 stage funnel this beats a per-user sort + sequence scan because
    no per-user state or ordering is ever materialized.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    ev = df.filter(F.col(type_col).isin(stages)).select(
        user_col, type_col, ts_col
    )
    # Stage 0: earliest occurrence of the entry event per user.
    frontier = (
        ev.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t0"))
    )
    counts = [frontier]
    prev = frontier.withColumnRenamed("_t0", "_tprev")
    for stage in stages[1:]:
        nxt = (
            ev.filter(F.col(type_col) == stage)
            .join(prev, user_col)
            .filter(F.col(ts_col) > F.col("_tprev"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("_tnext"))
        )
        counts.append(nxt)
        prev = nxt.withColumnRenamed("_tnext", "_tprev")
    rows = None
    for i, (stage, frame) in enumerate(zip(stages, counts)):
        row = frame.agg(
            F.lit(i + 1).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_weeks: int = 4,
) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the week of their
    first event; for each (cohort_week, k) we count the distinct users
    active k weeks after their cohort week (k=0..max_weeks).

    Two aggregations, both on ``user_col`` first: (1) per-user first-seen
    day (one shuffle), (2) distinct user-week activity re-joined to the
    cohort and aggregated per (cohort_week, k). The user-week distinct is
    map-side-reducible and the final group-by is on the tiny
    (weeks x weeks) key space.
    """
    day = F.date_trunc("week", F.col(ts_col)).cast("date")
    first = df.groupBy(user_col).agg(
        F.min(day).alias("cohort_week")
    )
    activity = df.select(
        F.col(user_col), day.alias("active_week")
    ).distinct()
    joined = activity.join(first, user_col).withColumn(
        "weeks_after",
        F.datediff(F.col("active_week"), F.col("cohort_week")) / 7,
    )
    return (
        joined.filter(F.col("weeks_after") <= max_weeks)
        .groupBy("cohort_week", F.col("weeks_after").cast("int").alias("weeks_after"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
