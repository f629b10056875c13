"""Z-order (Morton) clustering — multi-dimensional data layout for skipping.

Parquet min/max row-group pruning is one-dimensional: sort by column A
and filters on B skip nothing. Interleaving the bits of several columns
into one Morton key and range-partition-sorting by it gives every
partition a small bounding box in ALL keyed dimensions, so filters on any
subset of them prune files/row-groups — the technique behind
Delta/Iceberg OPTIMIZE ZORDER, here as a plain column expression.

``zorder_key`` is pure bit arithmetic (shift/mask/or), generated per bit
position — whole-stage codegen, exactly reproducible in any engine, and
therefore DuckDB-oracle-checkable. ``zorder_layout`` applies it:
``repartitionByRange(z)`` (one range shuffle with a sampled histogram —
the same mechanism as a global sort, but that's write-time cost paid once
to make every later scan cheaper) + ``sortWithinPartitions`` so row
groups inside each file are also z-contiguous.

Columns are first normalized to ``bits``-wide non-negative ints by the
caller (e.g. ``pmod(key, 2^bits)`` for surrogate keys, or a scaled
min-max for doubles) — the interleave itself never samples the data, so
layout is deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton-interleave ``cols`` (each already in [0, 2^bits)) into one
    long: output bit (b*n + j) = bit b of column j. n*bits must be ≤ 63."""
    n = len(cols)
    assert n * bits <= 63, "z-key must fit a signed long"
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1).cast("long"))
            z = z + F.shiftleft(bit, b * n + j)
    return z


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_partitions: int | None = None,
    key_name: str = "_zorder",
) -> DataFrame:
    """Cluster ``df`` for write: add the Morton key over ``pmod(col, 2^bits)``
    normalizations, range-partition and sort by it. Downstream:
    ``df.write.partitionBy(...)`` or plain parquet — each output file then
    covers a compact hyper-rectangle of the keyed columns."""
    m = F.lit(1 << bits).cast("long")
    z = zorder_key([F.pmod(F.col(c).cast("long"), m) for c in cols], bits)
    out = df.withColumn(key_name, z)
    if num_partitions:
        out = out.repartitionByRange(num_partitions, key_name)
    else:
        out = out.repartitionByRange(key_name)
    return out.sortWithinPartitions(key_name)


def hilbert_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_partitions: int | None = None,
    key_name: str = "_hilbert",
) -> DataFrame:
    """Cluster ``df`` for write by the Hilbert index over
    ``pmod(col, 2^bits)`` normalizations of two columns — same contract
    as `zorder_layout` (one write-time range shuffle + in-partition
    sort), tighter resulting bounding boxes.

    Keep ``2^bits`` ABOVE the key range: ``pmod`` folds larger keys onto
    the grid, and folded cells are far apart in raw key space — locality
    measured on the raw keys degrades even though the curve itself is
    perfect (seen at 8 bits over ~2000-valued keys). 16 bits costs one
    Project per level, nothing more."""
    assert len(cols) == 2, "hilbert_layout is 2-D; use zorder_layout for more"
    m = F.lit(1 << bits).cast("long")
    out = add_hilbert_key(
        df,
        F.pmod(F.col(cols[0]).cast("long"), m),
        F.pmod(F.col(cols[1]).cast("long"), m),
        bits=bits,
        key_name=key_name,
    )
    if num_partitions:
        out = out.repartitionByRange(num_partitions, key_name)
    else:
        out = out.repartitionByRange(key_name)
    return out.sortWithinPartitions(key_name)


def add_hilbert_key(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 8,
    key_name: str = "hval",
) -> DataFrame:
    """Append the 2-D Hilbert-curve index of (x, y) — both already in
    [0, 2^bits) — as ``key_name``: the locality-superior alternative to
    `zorder_key`. Every step of the curve moves to an ADJACENT cell, so
    range-partitioning by it gives tighter per-file bounding boxes than
    Morton (which teleports at quadrant boundaries). Same write-time
    usage: compute, range-partition, sortWithinPartitions.

    Shape matters here: the rotate-reflect recursion (classic xy2d)
    references each coordinate several times per level, so inlining all
    ``bits`` levels into ONE column expression explodes the converted
    Catalyst tree ~5x per level (measured: driver heap OOM at 8 bits).
    Emitting one Project per level instead keeps the plan LINEAR —
    CollapseProject deliberately refuses to merge projections that would
    duplicate non-trivial multiply-referenced aliases — and every level
    stays inside whole-stage codegen. Pure integer bit arithmetic:
    deterministic, engine-agnostic, DuckDB-oracle-checkable.
    """
    n = 1 << bits
    one = F.lit(1).cast("long")
    tx, ty = f"_hx_{key_name}", f"_hy_{key_name}"
    out = df.select(
        "*",
        x.cast("long").alias(tx),
        y.cast("long").alias(ty),
        F.lit(0).cast("long").alias(key_name),
    )
    passthrough = [c for c in df.columns]
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        cx, cy = F.col(tx), F.col(ty)
        rx = F.shiftright(cx, i).bitwiseAND(one)
        ry = F.shiftright(cy, i).bitwiseAND(one)
        d = F.col(key_name) + F.lit(s * s).cast("long") * (rx * 3).bitwiseXOR(ry)
        ry_set = ry == 1
        rx_set = rx == 1
        nx = (
            F.when(ry_set, cx)
            .when(rx_set, F.lit(n - 1).cast("long") - cy)
            .otherwise(cy)
        )
        ny = (
            F.when(ry_set, cy)
            .when(rx_set, F.lit(n - 1).cast("long") - cx)
            .otherwise(cx)
        )
        out = out.select(
            *passthrough, nx.alias(tx), ny.alias(ty), d.alias(key_name)
        )
    return out.drop(tx, ty)


def zone_map_stats(
    df: DataFrame,
    bucket_col: str,
    bucket_width: int,
    stat_col: str,
    ndv_col: str,
) -> DataFrame:
    """Zone maps (per-slice min/max/count/ndv), the data-skipping
    artifact behind Parquet row-group pruning and ClickHouse/ORC
    indexes — computed as a first-class relation so skipping
    effectiveness is measurable instead of assumed.

    Buckets are fixed-width ranges of ``bucket_col`` (the file/row-group
    surrogate: at write time rows land in ``bucket_col div width``
    slices; zone extent is what a reader's predicate would consult).
    Output per bucket: row count, min/max of ``stat_col``, exact ndv of
    ``ndv_col``, plus the zone WIDTH RATIO ``(max - min)`` of the
    bucket's stat range in days — wide zones are the unclustered ones a
    z-order rewrite would tighten.

    One combinable aggregation keyed on the bucket id (ndv is exact via
    two-level groupBy — count-distinct rewrites to a partial-aggregated
    expand, no naive shuffle of raw values). Bucket count scales as
    key-range/width — bounded metadata, the zone-map property.
    """
    b = F.expr(f"{bucket_col} div {bucket_width}").alias("bucket")
    return (
        df.groupBy(b)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(stat_col).alias("stat_min"),
            F.max(stat_col).alias("stat_max"),
            F.countDistinct(ndv_col).alias("ndv"),
            F.datediff(F.max(stat_col), F.min(stat_col)).alias(
                "zone_width_days"
            ),
        )
        .orderBy("bucket")
    )


def zone_prune_summary(
    zones: DataFrame, predicate_min: str
) -> DataFrame:
    """Skipping effectiveness of a zone map for ``stat_col >= X``: how
    many zones (and rows) a reader skips because the zone's max falls
    below the predicate bound. One row; the number a table-layout
    decision is made on."""
    lit = F.lit(predicate_min).cast("timestamp")
    prunable = F.col("stat_max") < lit
    return zones.agg(
        F.count(F.lit(1)).alias("n_zones"),
        F.sum(prunable.cast("bigint")).alias("n_prunable"),
        F.sum(F.when(prunable, F.col("n_rows")).otherwise(F.lit(0))).alias(
            "rows_skipped"
        ),
        F.sum("n_rows").alias("rows_total"),
    )
