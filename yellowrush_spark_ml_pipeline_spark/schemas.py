"""Central schema registry.

The reference hand-builds a ``StructType`` for every read
(``nyc_taxi_final.py:167-179``, ``:306-315``, ``:553-557``) — explicit
schemas double as projection pushdown and skip inference scans. We keep that
discipline but centralize the schemas so every operator agrees on types.

Covers the reference's two domain inputs (weather CSV, taxi parquet) and the
driver's synthetic test tables (``TESTDATA.md``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- domain schemas (reference parity) -------------------------------------

# nyc_taxi_final.py:167-179 — weather CSV, headerless
WEATHER_SCHEMA = StructType(
    [
        StructField("date", DateType(), True),
        StructField("tavg", FloatType(), True),
        StructField("tmin", FloatType(), True),
        StructField("tmax", FloatType(), True),
        StructField("prcp", FloatType(), True),
        StructField("snow", IntegerType(), True),
        StructField("wdir", IntegerType(), True),
        StructField("wspd", FloatType(), True),
        StructField("wpgt", FloatType(), True),
        StructField("pres", FloatType(), True),
        StructField("tsun", IntegerType(), True),
    ]
)

# nyc_taxi_final.py:306-315 — 8-column projection of the ~19-col TLC files
TAXI_SCHEMA = StructType(
    [
        StructField("tpep_pickup_datetime", TimestampType(), True),
        StructField("tpep_dropoff_datetime", TimestampType(), True),
        StructField("trip_distance", DoubleType(), True),
        StructField("congestion_surcharge", DoubleType(), True),
        StructField("PULocationID", IntegerType(), True),
        StructField("DOLocationID", IntegerType(), True),
        StructField("extra", DoubleType(), True),
        StructField("tolls_amount", DoubleType(), True),
    ]
)

# nyc_taxi_final.py:553-557 — cleaned weather subset used by the join
WEATHER_CLEAN_SCHEMA = StructType(
    [
        StructField("date", DateType(), True),
        StructField("tmin", DoubleType(), True),
        StructField("prcp", DoubleType(), True),
    ]
)

# --- synthetic test tables (TESTDATA.md) ------------------------------------

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": StructType(
        [
            StructField("r_regionkey", IntegerType(), True),
            StructField("r_name", StringType(), True),
        ]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType(), True),
            StructField("n_name", StringType(), True),
            StructField("n_regionkey", IntegerType(), True),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType(), True),
            StructField("c_name", StringType(), True),
            StructField("c_nationkey", IntegerType(), True),
            StructField("c_acctbal", DoubleType(), True),
            StructField("c_mktsegment", StringType(), True),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType(), True),
            StructField("s_name", StringType(), True),
            StructField("s_nationkey", IntegerType(), True),
            StructField("s_acctbal", DoubleType(), True),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType(), True),
            StructField("p_name", StringType(), True),
            StructField("p_brand", StringType(), True),
            StructField("p_type", StringType(), True),
            StructField("p_size", IntegerType(), True),
            StructField("p_retailprice", DoubleType(), True),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType(), True),
            StructField("o_custkey", LongType(), True),
            StructField("o_orderstatus", StringType(), True),
            StructField("o_totalprice", DoubleType(), True),
            StructField("o_orderdate", TimestampType(), True),
            StructField("o_orderpriority", StringType(), True),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType(), True),
            StructField("l_partkey", LongType(), True),
            StructField("l_suppkey", LongType(), True),
            StructField("l_linenumber", IntegerType(), True),
            StructField("l_quantity", DoubleType(), True),
            StructField("l_extendedprice", DoubleType(), True),
            StructField("l_discount", DoubleType(), True),
            StructField("l_tax", DoubleType(), True),
            StructField("l_returnflag", StringType(), True),
            StructField("l_linestatus", StringType(), True),
            StructField("l_shipdate", TimestampType(), True),
        ]
    ),
    "events": StructType(
        [
            StructField("event_id", LongType(), True),
            StructField("ts", TimestampType(), True),
            StructField("user_id", LongType(), True),
            StructField("event_type", StringType(), True),
            StructField("value", DoubleType(), True),
            StructField("props", StringType(), True),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("text", StringType(), True),
            StructField("lang", StringType(), True),
            StructField("source", StringType(), True),
            StructField("n_chars", LongType(), True),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType(), True),
            StructField("embedding", ArrayType(FloatType()), True),
            StructField("label", IntegerType(), True),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)

# Variant for files whose ts column is physically TIMESTAMP(NANOS): Spark has
# no nanosecond timestamp type, so ts is read as raw nanos (LongType, with
# spark.sql.legacy.parquet.nanosAsLong=true) and truncated to µs in the
# reader — the same truncation DuckDB applies. The reader probes the parquet
# footer and picks this schema only when the file really is nanos.
EVENTS_NANOS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", LongType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)
