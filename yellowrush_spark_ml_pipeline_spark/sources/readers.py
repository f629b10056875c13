"""Schema'd readers (SURVEY.md §2.1 S2-S4).

Explicit schemas everywhere: skips the inference scan and acts as projection
pushdown at the parquet reader (the reference's deliberate choice,
``nyc_taxi_final.py:77``, ``:187``, ``:318``). Glob paths are supported
unchanged — a multi-file read is an implicit union handled by the source
(``nyc_taxi_final.py:318``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..schemas import EVENTS_NANOS_SCHEMA, TESTDATA_SCHEMAS


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = False,
    **options: str,
) -> DataFrame:
    """CSV scan with explicit schema (S2, nyc_taxi_final.py:187)."""
    return spark.read.schema(schema).options(header=str(header).lower(), **options).csv(path)


def read_parquet(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Parquet scan, optional explicit schema for column pruning (S3/S4).

    Passing a subset schema prunes columns at the scan, exactly like the
    reference's 8-of-19-column taxi read (nyc_taxi_final.py:306-318).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def _parquet_ts_unit(path: str, col: str = "ts") -> str:
    """Physical timestamp unit ('us'/'ms'/'ns') of one column, from parquet
    footers only — a driver-side metadata read, no data scan. Used to keep
    ``events.ts`` loading correct across testdata generations (round 2
    shipped TIMESTAMP(NANOS); round 3 ships TIMESTAMP(MICROS) — a silent
    1000x corruption if the wrong decode path is assumed).

    For a directory, probes BOTH the lexicographic min and max part files
    and raises on a unit mismatch: a mixed-unit directory has no single
    correct decode path, and misreading half the files by 1000x must fail
    loudly, not silently."""
    import glob as _glob
    import os as _os

    try:
        import pyarrow.parquet as _pq

        targets = [path]
        if _os.path.isdir(path):
            inner = sorted(_glob.glob(_os.path.join(path, "*.parquet")))
            if inner:
                targets = [inner[0], inner[-1]] if len(inner) > 1 else [inner[0]]
        units = {
            getattr(_pq.read_schema(t).field(col).type, "unit", "us") for t in targets
        }
    except Exception:
        return "us"
    if len(units) > 1:
        raise ValueError(
            f"mixed parquet timestamp units {sorted(units)} across part files "
            f"under {path!r} (column {col!r}); rewrite to a single unit"
        )
    return units.pop()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic test table with its registered schema.

    ``events.ts`` may be parquet TIMESTAMP(NANOS) (older generators):
    Spark has no nanosecond timestamp type, so that case is read as raw
    nanos and truncated to a µs timestamp (same truncation DuckDB
    applies). The normal µs/ms case maps straight to TimestampType."""
    path = f"{sf_dir}/{name}.parquet"
    if name == "events" and _parquet_ts_unit(path) == "ns":
        from pyspark.sql import functions as F

        # The legacy conf is bound at DataFrame ANALYSIS time (the
        # read.parquet call), so scoping it with try/finally keeps the
        # returned lazy DataFrame valid while guaranteeing later reads of
        # other TIMESTAMP(NANOS) parquet in the same session fail loudly
        # instead of silently decoding as LongType.
        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "true")
        try:
            df = read_parquet(spark, path, EVENTS_NANOS_SCHEMA)
        finally:
            if prev is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prev)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return read_parquet(spark, path, TESTDATA_SCHEMAS.get(name))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    **options: str,
) -> DataFrame:
    """JSON-lines scan with explicit schema — the standard interchange
    format of web-crawl / LLM-corpus pipelines (one document object per
    line). An explicit schema is non-negotiable at scale: schema
    inference is a full extra pass over the data, and a drifting inferred
    schema silently changes downstream plans. Pass
    ``mode='PERMISSIVE'`` (default) + a ``_corrupt_record`` column in the
    schema to quarantine malformed lines instead of failing the job."""
    return spark.read.schema(schema).options(**options).json(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC scan (columnar sibling of parquet; same pushdown/pruning
    machinery in Spark — PushedFilters and ReadSchema reach the reader)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Raw-media ingest via Spark's built-in ``binaryFile`` source — the
    entry point of the multimodal tier (operators/multimodal.py expects
    exactly this shape: a binary ``content`` column plus path/size
    metadata). Schema is fixed by the source:
    (path string, modificationTime timestamp, length bigint,
    content binary).

    ``glob`` maps to ``pathGlobFilter`` (e.g. ``"*.png"``) — filtering
    happens at FILE LISTING time, before any byte is read.

    Scale notes: each file becomes one row read in full, so this source
    is for media objects (images, audio clips), not giant archives —
    shard multi-GB tars upstream. ``spark.sql.files.maxPartitionBytes``
    controls how many files pack into a task; listing parallelizes
    across the driver's listing threads, and at 100 TB the path column
    should carry partition-style prefixes (dt=.../source=...) so
    downstream joins can prune on it."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
