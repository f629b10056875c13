"""binaryFile source → multimodal pipeline integration: write planted
media files to disk, ingest through read_binary_files (glob pushdown at
listing time), and decode pixel-exactly through the existing Arrow
featurizer — the end-to-end media ingest path."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from yellowrush_spark_ml_pipeline_spark.operators.multimodal import (
    encode_bmp,
    extract_features,
    probe_media,
)
from yellowrush_spark_ml_pipeline_spark.sources import read_binary_files


def _write_fixture_files(tmpdir: str) -> dict[str, bytes]:
    red_row = [(255, 0, 0)] * 4
    blue_row = [(0, 0, 255)] * 4
    files = {
        "red.bmp": encode_bmp([red_row] * 4),
        "blue.bmp": encode_bmp([blue_row] * 4),
        "notes.txt": b"not a media file",
    }
    for name, payload in files.items():
        with open(os.path.join(tmpdir, name), "wb") as f:
            f.write(payload)
    return files


def test_binary_source_reads_content_and_metadata(spark, tmp_path):
    files = _write_fixture_files(str(tmp_path))
    df = read_binary_files(spark, str(tmp_path))
    rows = {os.path.basename(r.path): r for r in df.collect()}
    assert set(rows) == set(files)
    for name, payload in files.items():
        assert bytes(rows[name].content) == payload
        assert rows[name].length == len(payload)


def test_binary_source_glob_filters_at_listing(spark, tmp_path):
    _write_fixture_files(str(tmp_path))
    df = read_binary_files(spark, str(tmp_path), glob="*.bmp")
    names = {os.path.basename(r.path) for r in df.select("path").collect()}
    assert names == {"red.bmp", "blue.bmp"}


def test_binary_source_feeds_multimodal_pipeline_pixel_exact(spark, tmp_path):
    """Files on disk -> binaryFile scan -> probe + featurize: the probe
    must identify 4x4 BMPs and the decoded mean-channel features must be
    exactly the planted colors (red: mean_r=1.0; blue: mean_b=1.0)."""
    _write_fixture_files(str(tmp_path))
    media = read_binary_files(spark, str(tmp_path), glob="*.bmp").select(
        F.regexp_extract(F.col("path"), r"([^/]+)\.bmp$", 1).alias("name"),
        F.abs(F.xxhash64("path")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("content").alias("payload"),
    )
    probed = {r.media_id: r for r in probe_media(media).collect()}
    assert all(p.format == "bmp" and p.width == 4 and p.height == 4
               for p in probed.values())
    name_by_id = {r.media_id: r.name for r in media.select("media_id", "name").collect()}
    feats = {
        name_by_id[r.media_id]: list(r.feature)
        for r in extract_features(media).collect()
    }
    # feature layout (multimodal._decode_bmp):
    # [width, height, mean_r, mean_g, mean_b, lum_mean, lum_std, 2.0]
    assert feats["red"][:5] == [4.0, 4.0, 255.0, 0.0, 0.0]
    assert feats["blue"][:5] == [4.0, 4.0, 0.0, 0.0, 255.0]
