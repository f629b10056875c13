"""Scan-parallelism floor for unsplittable inputs (guide §2.5 remedy).

A parquet file is splittable only at row-group boundaries; a table written
as one row group therefore scans as ONE task no matter how
``spark.sql.files.maxPartitionBytes`` / ``minPartitionNum`` are set — and
every expression fused into that scan (regex quality rules, per-gram md5,
array math) runs on a single core while the rest of the cluster idles.
The standard remedy is a repartition immediately after the read,
CONDITIONAL on the scan actually being starved: at production scale,
inputs split into thousands of tasks and the condition never fires, so
no extra exchange is paid where the layout is already healthy.

Only operators whose results are PARTITION-INVARIANT may use this —
exactly the invariance the driver-mirror's ``--shuffle N`` probe asserts
for every oracle query.  Never apply it near ``randomSplit`` /
``sample`` consumers, whose draws depend on the partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_scan_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism iff its current plan yields fewer than ``min_fraction``
    of that many partitions.  No-op for streaming frames and whenever
    the input already splits (the 100 TB case); the target derives from
    the session's core count, never a constant."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — planning-only probe; never fail the op
        return df
    if n < max(2, int(target * min_fraction)):
        return df.repartition(target)
    return df
