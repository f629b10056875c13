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
