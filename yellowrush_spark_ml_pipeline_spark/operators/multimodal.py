"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.13).

Media is modeled as opaque ``binary`` payload columns + typed metadata
structs, processed by Arrow-batched ``mapInPandas`` — the Spark-side shape
(schemas, batching, partition sizing) is real and tested; the actual codec
calls are stubbed because this container has no image/audio libraries
(clearly marked below). Swap ``_decode_stub`` for PIL/libav calls and
nothing else changes.

Scale notes:
* payloads stay in executors end-to-end (no driver collects);
* ``spark.sql.files.maxPartitionBytes`` bounds batch memory; media rows are
  large so repartition to ~128 MB of payload per task before heavy UDFs;
* Arrow moves the bytes Python-side once per batch, not per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def synthetic_media(spark, n: int = 64, payload_bytes: int = 1024) -> DataFrame:
    """Deterministic fake media table (payload = repeatable byte pattern)
    so the plumbing is testable without codecs."""
    rows = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
    )
    payload = F.repeat(
        F.concat(F.lit("p"), (F.col("media_id") % 251).cast("string")),
        payload_bytes // 4,
    ).cast("binary")
    return rows.select(
        "media_id",
        "kind",
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """STUB: deterministic fake "decode + featurize".

    Real deployment: PIL.Image.open / soundfile.read / pyav frame sample →
    resize → model features. Not available in this container, so we emit a
    repeatable 8-dim byte-statistic vector instead. Raises on None payload
    like a real decoder would.
    """
    if payload is None:
        raise NotImplementedError("no payload to decode")
    n = len(payload)
    return [
        float(n),
        float(payload[0]) if n else 0.0,
        float(payload[-1]) if n else 0.0,
        float(sum(payload[:64]) % 997),
        float(len(kind)),
        float(payload[n // 2]) if n else 0.0,
        float(n % 251),
        1.0,
    ]


def extract_features(media: DataFrame, batch_hint: int = 0) -> DataFrame:
    """Decode/featurize media payloads via Arrow-batched mapInPandas.

    The UDF consumes (media_id, kind, payload) batches and emits fixed-width
    feature vectors — the exact shape an image-resize / audio-fingerprint /
    frame-sample stage has at scale.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k) if p is not None else None
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": feats,
                }
            )

    cols = media.select("media_id", "kind", "payload")
    if batch_hint:
        cols = cols.repartition(batch_hint)
    return cols.mapInPandas(featurize, FEATURES_SCHEMA)
