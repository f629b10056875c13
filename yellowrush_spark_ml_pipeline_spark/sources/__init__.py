from .readers import (
    load_table,
    load_tables,
    read_binary_files,
    read_csv,
    read_parquet,
)
from .writers import (
    compact_parquet,
    upsert_partitions,
    write_bucketed_table,
    write_parquet,
    write_parquet_with_bloom,
    write_partitioned_parquet,
)

__all__ = [
    "compact_parquet",
    "load_table",
    "load_tables",
    "read_binary_files",
    "read_csv",
    "read_parquet",
    "write_bucketed_table",
    "write_parquet",
    "write_parquet_with_bloom",
    "upsert_partitions",
    "write_partitioned_parquet",
]
