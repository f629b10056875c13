"""Event-sequence analytics (operators/events.py) + decontamination:
semantic edges the oracle's aggregate hash can't isolate — strict stage
ordering, first-touch frontiers, planted contamination."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from yellowrush_spark_ml_pipeline_spark.operators import events as events_ops
from yellowrush_spark_ml_pipeline_spark.operators import textstats


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, _ts(m)) for u, t, m in rows], ["user_id", "event_type", "ts"]
    )


def test_funnel_requires_strict_order(spark):
    ev = _ev(
        spark,
        [
            # u1: full ordered funnel
            (1, "view", 0), (1, "click", 1), (1, "purchase", 2),
            # u2: purchase BEFORE click → stops at click
            (2, "view", 0), (2, "purchase", 1), (2, "click", 2),
            # u3: click before any view → only view counts
            (3, "click", 0), (3, "view", 1),
            # u4: never viewed → not in funnel at all
            (4, "click", 0), (4, "purchase", 1),
        ],
    )
    out = events_ops.funnel_counts(ev, ["view", "click", "purchase"])
    got = {r.stage: r.n_users for r in out.collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_first_touch_frontier(spark):
    # u1's FIRST view is at t0; a later view at t3 must not resurrect a
    # click at t4 into an earlier-stage window... it should: first-touch
    # means the frontier is the EARLIEST qualifying event, so a click any
    # time after t0 counts.
    ev = _ev(spark, [(1, "view", 0), (1, "view", 3), (1, "click", 4)])
    out = events_ops.funnel_counts(ev, ["view", "click"])
    got = {r.stage: r.n_users for r in out.collect()}
    assert got == {"view": 1, "click": 1}


def test_funnel_same_timestamp_not_counted(spark):
    # Strict ordering: a click at exactly the view's timestamp is NOT
    # after it.
    ev = _ev(spark, [(1, "view", 0), (1, "click", 0)])
    out = events_ops.funnel_counts(ev, ["view", "click"])
    got = {r.stage: r.n_users for r in out.collect()}
    assert got == {"view": 1, "click": 0}


def test_funnel_window_equals_s_pass_on_edges(spark):
    # The single-shuffle window variant must agree with the S-pass variant
    # on every ordering edge case at once.
    ev = _ev(
        spark,
        [
            (1, "view", 0), (1, "click", 1), (1, "purchase", 2),
            (2, "view", 0), (2, "purchase", 1), (2, "click", 2),
            (3, "click", 0), (3, "view", 1),
            (4, "click", 0), (4, "purchase", 1),
            (5, "view", 0), (5, "click", 0),      # same-ts: strict > fails
            (6, "view", 0), (6, "view", 3), (6, "click", 4),  # first-touch
        ],
    )
    stages = ["view", "click", "purchase"]
    a = {r.stage: r.n_users for r in events_ops.funnel_counts(ev, stages).collect()}
    b = {
        r.stage: r.n_users
        for r in events_ops.funnel_counts_window(ev, stages).collect()
    }
    # view: u1 u2 u3 u5 u6; click: u1, u2 (click@2 > view@0), u6; purchase: u1
    assert a == b == {"view": 5, "click": 3, "purchase": 1}


def test_funnel_window_equals_s_pass_on_events_table(spark, sf_small):
    from yellowrush_spark_ml_pipeline_spark.sources import load_table

    ev = load_table(spark, sf_small, "events")
    stages = ["view", "click", "purchase"]
    a = {r.stage: r.n_users for r in events_ops.funnel_counts(ev, stages).collect()}
    b = {
        r.stage: r.n_users
        for r in events_ops.funnel_counts_window(ev, stages).collect()
    }
    assert a == b
    assert a["view"] > 0


def test_cohort_retention_counts(spark):
    # Two users cohorted in week of Jan 1 2024 (Mon); one returns in
    # week+1, both active week 0.
    rows = [
        (1, "view", dt.datetime(2024, 1, 2, 10)),
        (1, "view", dt.datetime(2024, 1, 9, 10)),   # next week
        (2, "view", dt.datetime(2024, 1, 3, 10)),
        (2, "view", dt.datetime(2024, 1, 4, 10)),   # same week → 1 row
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = events_ops.cohort_retention(ev, max_weeks=4)
    got = {(str(r.cohort_week), r.weeks_after): r.n_users for r in out.collect()}
    assert got == {("2024-01-01", 0): 2, ("2024-01-01", 1): 1}


def test_decontaminate_flags_planted_benchmark_docs(spark, sf_small):
    from yellowrush_spark_ml_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_small, "documents")
    benchmark = docs.filter(F.col("doc_id") % 37 == 0)
    out = textstats.benchmark_overlap(docs, benchmark, n=8, flag_pct=10)
    bench_ids = {r.doc_id for r in benchmark.select("doc_id").collect()}
    flagged = {r.doc_id for r in out.filter("contaminated").collect()}
    # Every benchmark doc long enough to have grams must self-flag 100%.
    rows = {r.doc_id: r for r in out.collect()}
    for did in bench_ids:
        if did in rows:
            assert rows[did].n_contaminated == rows[did].n_grams
            assert rows[did].contaminated
    # Contamination must not blanket the corpus: planted benchmark docs
    # (plus their planted near-duplicates) flag, the long tail does not.
    assert len(flagged) < out.count() * 0.5


def test_select_canonical_quality_argmax(spark):
    from yellowrush_spark_ml_pipeline_spark.operators.dedup import select_canonical

    docs = spark.createDataFrame(
        [
            # component {1, 2, 9}: doc 9 has the best quality
            (1, 0.50), (2, 0.75), (9, 1.00),
            # singleton
            (5, 0.25),
        ],
        ["doc_id", "quality_score"],
    )
    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (9, 1)], ["doc_id", "group_id"]
    )
    min_id = {r.doc_id for r in select_canonical(docs, groups).collect()}
    assert min_id == {1, 5}
    best = {
        r.doc_id
        for r in select_canonical(
            docs, groups, quality_col="quality_score"
        ).collect()
    }
    assert best == {9, 5}


def test_select_canonical_tie_breaks_to_min_id(spark):
    from yellowrush_spark_ml_pipeline_spark.operators.dedup import select_canonical

    docs = spark.createDataFrame(
        [(3, 0.5), (7, 0.5)], ["doc_id", "quality_score"]
    )
    groups = spark.createDataFrame([(3, 3), (7, 3)], ["doc_id", "group_id"])
    best = {
        r.doc_id
        for r in select_canonical(
            docs, groups, quality_col="quality_score"
        ).collect()
    }
    assert best == {3}


def test_curate_corpus_best_quality_canonical(spark, sf_small):
    from yellowrush_spark_ml_pipeline_spark.flows import curate_corpus
    from yellowrush_spark_ml_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_small, "documents")
    a = curate_corpus(docs, canonical="min_id")
    b = curate_corpus(docs, canonical="best_quality")
    # Same number of survivors (one per component either way), same
    # schema; the selected ids may differ.
    assert a.count() == b.count()
    assert a.columns == b.columns


def test_resize_images_real_bmp_path(spark):
    from yellowrush_spark_ml_pipeline_spark.operators.multimodal import (
        _bmp_pixels,
        encode_bmp,
        resize_images,
    )

    # 4x4 image, left half red, right half blue → 2x2 resize keeps halves
    red, blue = (255, 0, 0), (0, 0, 255)
    px = [[red, red, blue, blue]] * 4
    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_bmp(px)), "image/bmp", 4, 4, None),
         (2, "image", bytearray(b"\xff\xd8notbmp"), "image/jpeg", None, None, None),
         (3, "audio", bytearray(b"RIFF"), "audio/wav", None, None, None)],
        "media_id long, kind string, payload binary, mime string, width int, height int, duration_ms int",
    )
    out = {r.media_id: r for r in resize_images(media, 2, 2).collect()}
    assert set(out) == {1, 2}  # audio row filtered, jpeg kept with NULL payload
    assert out[2].payload is None
    w, h, got = _bmp_pixels(bytes(out[1].payload))
    assert (w, h) == (2, 2)
    assert got == [[red, blue]] * 2
    assert out[1].mime == "image/bmp"


def test_sample_frames_every_other(spark):
    from yellowrush_spark_ml_pipeline_spark.operators.multimodal import (
        _bmp_pixels,
        sample_frames,
        synthetic_video_media,
    )

    vids = synthetic_video_media(spark, n=3, frames_per_video=6)
    frames = sample_frames(vids, every_n=2)
    rows = frames.collect()
    # 3 videos x frames {0, 2, 4}
    assert {(r.media_id, r.frame_idx) for r in rows} == {
        (i, j) for i in range(3) for j in (0, 2, 4)
    }
    # pixel-verify one sampled frame: video 2, frame 4
    target = next(r for r in rows if r.media_id == 2 and r.frame_idx == 4)
    _, _, px = _bmp_pixels(bytes(target.payload))
    assert px[0][0] == ((2 * 31 + 4 * 17) % 256, 4 % 256, 2 % 256)


def test_sampled_frames_feed_feature_extraction(spark):
    from pyspark.sql import functions as SF

    from yellowrush_spark_ml_pipeline_spark.operators.multimodal import (
        extract_features,
        sample_frames,
        synthetic_video_media,
    )

    vids = synthetic_video_media(spark, n=2, frames_per_video=4)
    frames = sample_frames(vids, every_n=2).select(
        (SF.col("media_id") * 100 + SF.col("frame_idx")).alias("media_id"),
        SF.lit("image").alias("kind"),
        "payload",
    )
    feats = extract_features(frames).collect()
    assert len(feats) == 4  # 2 videos x frames {0, 2}
    for r in feats:
        assert r.feature[0] == 4.0 and r.feature[1] == 4.0  # real BMP decode
