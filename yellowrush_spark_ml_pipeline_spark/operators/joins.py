"""Join operators (SURVEY.md §2.3 J1-J2, §2.11 D5/D9).

Scale notes baked into each operator:

* ``group_enrich`` (agg-then-self-join) reuses ONE shuffle: the aggregate
  and the probe side hash-partition on the same keys, so Catalyst reuses the
  exchange; with AQE the small aggregated side is usually broadcast.
  The window-function variant avoids materializing the aggregate at all.
* ``broadcast_dim_join`` pins BroadcastHashJoin for genuinely small dims
  (weather ≈ 180 rows in the reference) — no shuffle of the 100 TB fact side.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = (),
) -> DataFrame:
    """As-of (backward) join: attach to every left row the latest right
    row with ``right_ts <= left_ts`` for the same key — the canonical
    time-series enrichment (price as of trade time, state as of event
    time) that plain equi-joins can't express.

    Implemented as the union-sort trick, NOT a range join: tag both
    sides, union on (key, ts), and carry the right side's values forward
    with ``last(..., ignorenulls=True)`` over an ordered per-key window.
    One shuffle on the key, O(n log n) per key for the sort, zero row
    explosion — a naive ``left.ts >= right.ts`` theta-join materializes
    O(|left|x|right|) per key before picking the max, which is exactly
    the plan that dies at 100 TB. Right rows order before left rows on
    timestamp ties so a same-instant state IS visible to the left row
    (matching ``ASOF JOIN``'s >= semantics). Multiple right rows tied on
    (key, ts) resolve deterministically by ordering on the value columns
    (largest wins) — without the tiebreak the winner would depend on
    shuffle order."""
    vals = list(value_cols)
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in vals],
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l_tagged.schema["_lrow"].dataType
        ).alias("_lrow"),
        *[F.col(c).alias(f"_rv_{c}") for c in vals],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_side"), *[F.col(f"_rv_{c}") for c in vals])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tagged.unionByName(r_tagged)
    for c in vals:
        merged = merged.withColumn(
            f"_rv_{c}", F.last(f"_rv_{c}", ignorenulls=True).over(w)
        )
    out = merged.filter(F.col("_side") == 1)
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_rv_{c}").alias(c) for c in vals],
    )


def group_enrich_join(
    df: DataFrame,
    keys: Sequence[str],
    agg_exprs: Mapping[str, Column],
    how: str = "left",
) -> DataFrame:
    """Aggregate-then-self-join "group enrichment" (J1,
    nyc_taxi_final.py:471-486): attach group-level aggregates to every row.

    Join form matches reference semantics exactly (left join keeps rows with
    null keys unmatched)."""
    agg_df = df.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in agg_exprs.items()]
    )
    return df.join(agg_df, list(keys), how)


def group_enrich_window(
    df: DataFrame, keys: Sequence[str], exprs: Mapping[str, Column]
) -> DataFrame:
    """Window-function variant of J1: ``expr OVER (PARTITION BY keys)``.

    One shuffle, no join, no second scan — the plan we'd prefer at 100 TB
    when the input isn't already partitioned by the keys."""
    w = Window.partitionBy(*[F.col(k) for k in keys])
    out = df
    for name, expr in exprs.items():
        out = out.withColumn(name, expr.over(w))
    return out


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    how: str = "left",
    fill: Mapping[str, object] | None = None,
    broadcast: bool | None = True,
) -> DataFrame:
    """Dimension equi-join (J2/D9, nyc_taxi_final.py:558-564) with post-join
    null fill for unmatched rows (`na.fill({"tmin":0,"prcp":0})`).

    ``broadcast`` is a scale contract, not an optimization knob:
    * ``True``  — pin BroadcastHashJoin. ONLY for dims of fixed, small
      cardinality (the reference's weather table ≈ 180 rows; nation=25,
      region=5). A forced broadcast of a scale-proportional dim is a
      driver collect-and-ship OOM at 100 TB.
    * ``None``  — no hint; AQE chooses from observed stats (right default
      for dims that grow with the data, e.g. customer/part).
    * ``False`` — explicitly forbid broadcast (hint the dim as NO_BROADCAST
      via a merge-join preference) — for testing shuffle paths.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    if broadcast is True:
        dim = F.broadcast(dim)
    elif broadcast is False:
        dim = dim.hint("merge")
    out = fact.join(dim, on_cols, how)
    if fill:
        out = out.na.fill(dict(fill))
    return out


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Explicit key-salting for skewed equi-joins.

    A hot key (one user, one boilerplate shingle) lands all its fact rows
    in one task; salting appends a per-row salt to the fact side and
    replicates the dim side across all ``salt_buckets`` salts, splitting
    the hot key across that many tasks. Results are identical to the plain
    join (asserted in tests/test_plans.py).

    AQE's skew-join split (enabled in `session.get_spark`) covers the
    sort-merge case automatically; explicit salting remains the tool when
    the skewed side feeds an aggregation or the join is shuffled-hash.
    Replication multiplies only the DIM side (×salt_buckets) — use for
    fact-dim joins where the dim is modest, never fact-fact. Only inner
    and left joins are supported: any dim-preserving type (right/full)
    would emit one null-extended row per salt replica for unmatched dim
    keys."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: "
            "dim-preserving types duplicate unmatched dim rows per salt"
        )
    on_cols = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    fact_s = fact.withColumn("_salt", salt)
    dim_s = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return fact_s.join(dim_s, [*on_cols, "_salt"], how).drop("_salt")


def range_join_pairs(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 3600,
) -> DataFrame:
    """Time-range join: pairs where ``right_ts ∈ (left_ts - window,
    left_ts]`` for the same key, via bucketed equi-join.

    Both sides are bucketed by ``floor(epoch/window)``; a qualifying right
    row can only live in the left row's bucket or the one before, so the
    left side probes exactly two buckets and the join is a plain equi-join
    on (key, bucket) with a residual range filter. A naive theta-join
    (`l.ts BETWEEN ...`) is a per-key cross product — Catalyst can only
    nested-loop it, which is quadratic per key and dies at scale; the
    bucketed form shuffles on (key, bucket) like any equi-join.

    Output: all left columns + right's non-key columns suffixed `_r`."""
    w_us = window_seconds * 1_000_000
    l_bucket = F.floor(F.unix_micros(F.col(left_ts)) / w_us)
    r_bucket = F.floor(F.unix_micros(F.col(right_ts)) / w_us)
    l = left.withColumn("_probe", F.explode(F.array(l_bucket, l_bucket - 1)))
    rcols = [c for c in right.columns if c != key]
    r = right.select(
        F.col(key),
        r_bucket.alias("_probe"),
        *[F.col(c).alias(f"{c}_r") for c in rcols],
    )
    rt = F.col(f"{right_ts}_r")
    lt = F.col(left_ts)
    return (
        l.join(r, [key, "_probe"])
        .filter(
            (rt > lt - F.expr(f"INTERVAL {window_seconds} SECOND")) & (rt <= lt)
        )
        .drop("_probe")
    )


def semi_join(
    left: DataFrame, right: DataFrame, on: Sequence[str] | str
) -> DataFrame:
    """EXISTS-style filter join (SURVEY.md §2.3 note): keeps left rows with
    a match, emits no right columns — the plan ships only the join keys of
    the right side, never its payload."""
    on_cols = [on] if isinstance(on, str) else list(on)
    return left.join(right, on_cols, "left_semi")


def anti_join(
    left: DataFrame, right: DataFrame, on: Sequence[str] | str
) -> DataFrame:
    """NOT EXISTS-style exclusion join."""
    on_cols = [on] if isinstance(on, str) else list(on)
    return left.join(right, on_cols, "left_anti")


def star_join(
    fact: DataFrame,
    dims: Sequence[tuple],
    how: str = "inner",
) -> DataFrame:
    """Chain of dimension joins — the star-schema plan. Each dim is
    ``(df, on)`` or ``(df, on, broadcast)`` where ``broadcast`` follows
    `broadcast_dim_join`'s contract (default ``None`` = AQE decides).

    With fixed-size dims pinned broadcast and AQE promoting the rest when
    they fit, the fact side streams through BroadcastHashJoins with zero
    fact shuffles; a genuinely large dim degrades to a shuffle join instead
    of an executor OOM."""
    out = fact
    for entry in dims:
        dim, on, bcast = entry if len(entry) == 3 else (*entry, None)
        out = broadcast_dim_join(out, dim, on, how, broadcast=bcast)
    return out


def full_outer_reconcile(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_probe: str,
    right_probe: str,
    sum_col: str | None = None,
) -> DataFrame:
    """Reconciliation audit between two relations sharing a key — the
    CDC/migration parity check: FULL OUTER join, classify every key as
    ``both`` / ``left_only`` / ``right_only``, and aggregate per status.

    ``left_probe`` / ``right_probe`` name columns that are non-null
    whenever their side matched (presence indicators); ``sum_col`` (from
    the right side, optional) is totaled per status with a decimal-exact
    sum so drift shows as value, not just key, divergence.

    Scale: ONE shuffle on the join key (both sides hash-partitioned),
    then a tiny agg on the 3-value status key. The status breakdown is
    the output a reconciliation job alerts on; the full row-level diff
    (filter status != 'both') reuses the same joined frame."""
    joined = left.join(right, on=[on], how="full_outer")
    status = (
        F.when(
            F.col(left_probe).isNotNull() & F.col(right_probe).isNotNull(),
            F.lit("both"),
        )
        .when(F.col(left_probe).isNotNull(), F.lit("left_only"))
        .otherwise(F.lit("right_only"))
    )
    aggs = [F.count(F.lit(1)).alias("n_keys")]
    if sum_col is not None:
        aggs.append(
            F.sum(F.col(sum_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value")
        )
    return joined.groupBy(status.alias("status")).agg(*aggs)
