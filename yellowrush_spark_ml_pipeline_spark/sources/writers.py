"""Sinks (SURVEY.md §2.1 S5-S6).

The partitioned writer repartitions by the partition column first, exactly
like the reference (``nyc_taxi_final.py:640-641``): without it every task
writes a file into every hive partition — at 100 TB that is a
small-files explosion (tasks × partitions files). With it, each output
partition is written by one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the frame (column stats / scan sizes).
    An estimate is exactly what file sizing needs — no extra job."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())  # noqa: SLF001


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    target_file_mb: int | None = None,
) -> None:
    """Plain parquet sink, overwrite by default (S5, nyc_taxi_final.py:231).

    ``target_file_mb`` sizes output files from Catalyst's plan estimate:
    at scale, a sink that inherits the upstream partitioning writes either
    thousands of KB-files (metadata pressure on every future scan) or a
    handful of multi-GB files (no read parallelism). Parquet compresses
    ~3-4x vs the in-memory estimate, so files land smaller than the
    target — the knob bounds the file COUNT, which is what matters."""
    if target_file_mb:
        n = max(1, _plan_size_bytes(df) // (target_file_mb * 1024 * 1024))
        current = df.rdd.getNumPartitions()
        # shrinking -> coalesce (narrow, no shuffle); growing -> repartition
        df = df.coalesce(n) if n < current else df.repartition(n)
    df.write.mode(mode).parquet(path)


def write_parquet_with_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: list[str] | str,
    mode: str = "overwrite",
    ndv: int | None = None,
    sort_within_partitions: list[str] | str | None = None,
) -> None:
    """Parquet sink with per-column BLOOM FILTERS (and optionally
    sorted-within-partition layout for tight min/max page statistics).

    At 100 TB the cheapest predicate is the one that never reads data:
    point lookups / IN-list probes on a high-cardinality key (doc_id,
    user_id, url hash) can skip entire row groups when the footer carries
    a bloom filter for that column — min/max stats alone are useless for
    hash-distributed keys, which is exactly where blooms shine. ``ndv``
    sizes the filter (expected distinct values per row group); leave None
    for parquet-mr's default sizing. Sorting within partitions
    additionally makes min/max page stats selective for range predicates
    on the sort key — the two layouts compose.

    Readers need nothing: Spark's vectorized parquet reader consults row-
    group blooms automatically for `=` and `IN` predicates."""
    cols = [bloom_cols] if isinstance(bloom_cols, str) else list(bloom_cols)
    if sort_within_partitions:
        s = (
            [sort_within_partitions]
            if isinstance(sort_within_partitions, str)
            else list(sort_within_partitions)
        )
        df = df.sortWithinPartitions(*s)
    writer = df.write.mode(mode)
    for c in cols:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
        if ndv:
            writer = writer.option(
                f"parquet.bloom.filter.expected.ndv#{c}", str(ndv)
            )
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str] | str,
    num_buckets: int,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (and optionally sorted) managed table.

    Two tables bucketed on the same keys with the same bucket count join
    WITHOUT a shuffle — at 100 TB this converts the nightly fact-fact join
    from the dominant exchange into a zero-exchange zipped scan, paying the
    shuffle once at write time instead of on every read. (Plan assertion in
    tests/test_io.py.)"""
    bcols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bcols)
    if sort_cols:
        scols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*scols)
    writer.saveAsTable(table_name)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | str,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned sink (S6, nyc_taxi_final.py:640-641).

    Repartition-by-column before partitionBy keeps file counts sane and the
    resulting layout gives readers partition pruning for free.
    """
    cols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    (
        df.repartition(*cols)
        .write.mode(mode)
        .partitionBy(*cols)
        .parquet(path)
    )


def upsert_partitions(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | str,
) -> None:
    """Partition-level upsert: overwrite ONLY the hive partitions present
    in ``df``, leaving every other partition untouched (dynamic partition
    overwrite). This is the incremental-backfill sink — reprocessing one
    day of a year-partitioned 100 TB table rewrites that day, not the
    year, and readers never see a window where untouched partitions are
    missing. Same repartition-first discipline as the full writer."""
    cols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.repartition(*cols)
            .write.mode("overwrite")
            .partitionBy(*cols)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — corpus-interchange output (one object per line,
    gzip-friendly, splittable when uncompressed). Same partition-count
    considerations as parquet apply; JSON costs ~3-5× parquet in bytes
    and scan CPU, so it is an EXPORT format here, not a pipeline-internal
    one."""
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (interop with Hive/Trino-centric estates)."""
    df.write.mode(mode).orc(path)


def compact_parquet(
    spark,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """Small-file compaction — the maintenance pass every long-lived
    dataset needs: streaming ingest and per-partition upserts strand
    thousands of KB-scale files whose per-file open/footer/listing cost
    comes to dominate scans long before data volume does. Sizes the
    output from the ACTUAL on-disk bytes (a driver-side metadata walk,
    no data read) and rewrites as ~`target_file_bytes` files; returns
    the output file count.

    Scale: one repartition round-trip (all data moves exactly once —
    schedule off-peak, or per-partition for hive layouts); writing to a
    sibling path + atomic rename keeps readers on a consistent layout
    throughout. Sizing goes through the Hadoop FileSystem API, so the
    byte walk works identically for file://, hdfs://, s3a://, or any
    configured scheme (a plain os.walk would silently find 0 bytes on a
    remote URI and funnel the whole dataset through one task)."""
    import math
    import os

    if os.path.abspath(dest_path) == os.path.abspath(src_path):
        raise ValueError(
            "compact_parquet: dest_path must differ from src_path — an "
            "overwrite-in-place would delete the source mid-read; write to "
            "a sibling path and rename."
        )
    # Hadoop FileSystem metadata walk — driver-side, no data read, and
    # scheme-agnostic (resolves file:// vs hdfs:// vs s3a:// from the
    # session's Hadoop conf exactly like the reader will).
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = 0
    it = fs.listFiles(hpath, True)  # recursive
    while it.hasNext():
        status = it.next()
        if status.getPath().getName().endswith(".parquet"):
            total += status.getLen()
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(src_path).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(dest_path)
    return n_files
