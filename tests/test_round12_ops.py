"""Round-12 operator tests — the r11 ADVICE hardening items:

* save_pq_index records scale_bits in meta.json and pq_search_index
  searches the artifact AT THAT SCALE (an index built with a
  non-default quantizer scale was previously searched at the default —
  silently wrong probe distances and residual LUTs); an artifact whose
  meta omits scale_bits is refused, not guessed at.
* save_pq_index accepts the lazy one-row ``cs`` centroid relation the
  sibling search functions take, and refuses any other DataFrame with
  a clear error instead of dying later inside payload serialization.
* append_semantic_state is retry-safe: a ``batch_tag`` already in
  meta's applied_tags skips the fold (no duplicated keepers), the
  version is returned unchanged, and the meta write is atomic
  (temp-file + os.replace — no torn meta.json).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tests.test_round10_ops import _blob_corpus
from tests.test_round11_ops import _pq_ivf_setup, _rows


def test_pq_index_scale_bits_round_trip(spark, tmp_path):
    """An index built at scale_bits=16 must be searched at 16 through
    the persisted path — identical rows to the direct in-memory search
    at 16 (and meta must record the scale)."""
    from yellowrush_spark_ml_pipeline_spark.operators import similarity

    corpus = _blob_corpus(spark, n_per=40, n_clusters=4, dim=8)
    queries = corpus.filter(F.col("vec_id") % 40 == 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cb = similarity.pq_train(corpus, m=4, k=4, n_assign=2)
    assigned, cents = similarity.ivf_build_index_exact(
        corpus, n_lists=8, lloyd_iters=2, scale_bits=16
    )
    enc = similarity.pq_encode(
        assigned.select("vec_id", "_list", F.col("_cv").alias("embedding")),
        cb,
        m=4,
        extra_cols=["_list"],
    )
    direct = _rows(
        similarity.pq_search_ivf_adc(
            enc, cb, cents, queries, k=5, m=4, n_probe=3, scale_bits=16
        )
    )
    path = str(tmp_path / "pq16")
    similarity.save_pq_index(enc, cb, cents, path, scale_bits=16)
    meta = json.loads((tmp_path / "pq16" / "meta.json").read_text())
    assert meta["scale_bits"] == 16
    persisted = _rows(
        similarity.pq_search_index(spark, path, queries, k=5, n_probe=3)
    )
    assert persisted == direct and persisted


def test_pq_search_index_refuses_missing_scale_bits(spark, tmp_path):
    from yellowrush_spark_ml_pipeline_spark.operators import similarity

    corpus, queries, cb, cents, enc = _pq_ivf_setup(spark, n_lists=8)
    path = str(tmp_path / "pq_noscale")
    similarity.save_pq_index(enc, cb, cents, path)
    meta_path = tmp_path / "pq_noscale" / "meta.json"
    meta = json.loads(meta_path.read_text())
    del meta["scale_bits"]
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="scale_bits"):
        similarity.pq_search_index(spark, path, queries, k=5, n_probe=3)


def test_save_pq_index_accepts_cs_relation(spark, tmp_path):
    """The lazy one-row cs relation (what the search functions take) is
    collected into the exact list form at save time — the reloaded
    centroids match the collected build's."""
    from yellowrush_spark_ml_pipeline_spark.operators import similarity

    corpus, queries, cb, cents, enc = _pq_ivf_setup(spark, n_lists=8)
    cs_rel = similarity.ivf_exact_cs(corpus, n_lists=8, lloyd_iters=2)
    path = str(tmp_path / "pq_csrel")
    similarity.save_pq_index(enc, cb, cs_rel, path)
    _enc2, _cb2, cents2, meta = similarity.load_pq_index(spark, path)
    assert meta["kind"] == "exact"
    assert cents2 == cents


def test_save_pq_index_refuses_foreign_dataframe(spark, tmp_path):
    from yellowrush_spark_ml_pipeline_spark.operators import similarity

    corpus, queries, cb, cents, enc = _pq_ivf_setup(spark, n_lists=8)
    with pytest.raises(ValueError, match="cs"):
        similarity.save_pq_index(
            enc, cb, corpus, str(tmp_path / "pq_bad")
        )


def test_append_semantic_state_batch_tag_idempotent(spark, tmp_path):
    """Folding the same tagged batch twice lands exactly once: the
    second call returns the unchanged version, the kept-set row count
    does not grow, and meta records the tag."""
    from yellowrush_spark_ml_pipeline_spark.operators import similarity

    corpus = _blob_corpus(spark)
    audit0, cents = similarity.semantic_dedup_build(
        corpus, threshold=0.9999, k=4
    )
    kept0 = (
        audit0.filter(F.col("keep") == 1)
        .select("vec_id", "cluster_id", "dist")
        .join(corpus, "vec_id")
    )
    path = str(tmp_path / "sem_tagged")
    similarity.save_semantic_state(kept0, cents, path)

    batch = _blob_corpus(
        spark, n_per=10, n_clusters=1, dim=8, seed=99, base_id=300_000
    )
    audit = similarity.semantic_dedup_incremental(
        batch, kept0, cents, threshold=0.9999
    ).localCheckpoint(eager=True)

    v1 = similarity.append_semantic_state(
        batch, audit, path, batch_tag="2026-08-16"
    )
    kept_after, _ = similarity.load_semantic_state(spark, path)
    n_after_first = kept_after.count()
    assert v1 == 2

    v2 = similarity.append_semantic_state(
        batch, audit, path, batch_tag="2026-08-16"
    )
    kept_retry, _ = similarity.load_semantic_state(spark, path)
    assert v2 == 2  # version unchanged — fold skipped
    assert kept_retry.count() == n_after_first  # no duplicated keepers

    meta = json.loads((tmp_path / "sem_tagged" / "meta.json").read_text())
    assert meta["applied_tags"] == ["2026-08-16"]
    assert meta["state_version"] == 2

    # a NEW tag folds normally
    batch2 = _blob_corpus(
        spark, n_per=8, n_clusters=1, dim=8, seed=77, base_id=500_000
    )
    audit2 = similarity.semantic_dedup_incremental(
        batch2, kept_retry, cents, threshold=0.9999
    ).localCheckpoint(eager=True)
    v3 = similarity.append_semantic_state(
        batch2, audit2, path, batch_tag="2026-08-17"
    )
    assert v3 == 3


def test_semantic_dedup_daily_retry_with_tag_is_noop_fold(spark, tmp_path):
    """The one-call daily tick under a scheduler retry: second call
    with the same batch_tag re-judges but must NOT re-fold."""
    from yellowrush_spark_ml_pipeline_spark.operators import similarity

    corpus = _blob_corpus(spark)
    audit0, cents = similarity.semantic_dedup_build(
        corpus, threshold=0.9999, k=4
    )
    kept0 = (
        audit0.filter(F.col("keep") == 1)
        .select("vec_id", "cluster_id", "dist")
        .join(corpus, "vec_id")
    )
    path = str(tmp_path / "sem_daily_tag")
    similarity.save_semantic_state(kept0, cents, path)

    batch = _blob_corpus(
        spark, n_per=10, n_clusters=1, dim=8, seed=99, base_id=300_000
    )
    similarity.semantic_dedup_daily(
        batch, path, threshold=0.9999, batch_tag="day1"
    ).collect()
    n1 = similarity.load_semantic_state(spark, path)[0].count()
    ver1 = json.loads(
        (tmp_path / "sem_daily_tag" / "meta.json").read_text()
    )["state_version"]

    similarity.semantic_dedup_daily(
        batch, path, threshold=0.9999, batch_tag="day1"
    ).collect()
    n2 = similarity.load_semantic_state(spark, path)[0].count()
    ver2 = json.loads(
        (tmp_path / "sem_daily_tag" / "meta.json").read_text()
    )["state_version"]
    assert (n2, ver2) == (n1, ver1)


# ---------------------------------------------------------------------------
# epoch-keyed export (r11 verdict #4, the builder's declared round-12
# seam): export_tokenized_set(mixture_factor_milli=...) composes the
# UNIFIED temperature stage — per-source uncapped rates down- OR
# up-sample as the target demands — with (doc_id, epoch) as the
# training-example key through split, packing and the epoch order.
# ---------------------------------------------------------------------------


def test_export_upsampled_epoch_keyed_end_to_end(spark, sf_small):
    from yellowrush_spark_ml_pipeline_spark.flows import export_tokenized_set
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import (
        temperature_mixture_upsample,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").filter(
        F.col("source").isin("src0", "src1") | (F.col("doc_id") % 3 == 0)
    )
    out = export_tokenized_set(docs, mixture_factor_milli=2500, max_epochs=4)
    rows = out.collect()
    assert rows, "up-sampled export produced nothing"

    # (a) (doc_id, epoch) is a unique key and epoch_rank a total order
    keys = [(r["doc_id"], r["epoch"]) for r in rows]
    assert len(keys) == len(set(keys))
    ranks = sorted(r["epoch_rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))

    # (b) the target (2.5x) forces genuine repetition somewhere: at
    # least one source carries epoch >= 1 rows, and every rate > 1e6
    # source repeats while every rate < 1e6 source only thins
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert any(r["epoch"] >= 1 for r in rows)
    for s, rs in by_source.items():
        rate = rs[0]["rate_micro"]
        max_epoch = max(r["epoch"] for r in rs)
        if rate > 1_000_000:
            assert max_epoch >= 1, (s, rate)
        else:
            assert max_epoch == 0, (s, rate)

    # (c) no train/val straddle: one split per doc across its epochs,
    # and pack_tokens (the doc's true token count) rides every copy
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for d, rs in per_doc.items():
        assert len({r["split"] for r in rs}) == 1, d
        assert len({r["pack_tokens"] for r in rs}) == 1, d

    # (d) the expansion matches the standalone up-sampler's copy counts
    exp = temperature_mixture_upsample(
        docs, "source", "doc_id", target_factor_milli=2500, max_epochs=4
    )
    expected = {
        (r["doc_id"], r["epoch"]) for r in exp.select("doc_id", "epoch").collect()
    }
    assert set(keys) == expected

    # (e) packing is ordered by (doc_id, epoch) within (split, lang):
    # replay the window by hand over the collected rows
    by_grp = {}
    for r in rows:
        by_grp.setdefault((r["split"], r["lang"]), []).append(r)
    for grp, rs in by_grp.items():
        rs.sort(key=lambda r: (r["doc_id"], r["epoch"]))
        cum = 0
        for r in rs:
            assert r["bin_id"] == cum // 2048, (grp, r["doc_id"], r["epoch"])
            cum += r["pack_tokens"]


def test_export_mixture_modes_mutually_exclusive(spark, sf_small):
    import pytest as _pytest

    from yellowrush_spark_ml_pipeline_spark.flows import export_tokenized_set

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    with _pytest.raises(ValueError, match="not both"):
        export_tokenized_set(docs, mixture=True, mixture_factor_milli=2500)


# ---------------------------------------------------------------------------
# amortized daily SemDeDup (r11 verdict #7): the two-day lifecycle run
# from an ivf-built (sampled MLlib fit) state must make the same keep
# decisions as the exact-Lloyd-built one — the quantizer choice is
# build-time only, the daily loop is frozen-geometry either way.
# ---------------------------------------------------------------------------


def _daily_two_day_keeps(spark, tmp_path, quantizer):
    import json

    from yellowrush_spark_ml_pipeline_spark.operators import similarity

    corpus = _blob_corpus(spark)
    audit0, cents = similarity.semantic_dedup_build(
        corpus, threshold=0.9999, k=4, quantizer=quantizer, n_lists=4,
        fit_fraction=1.0,
    )
    kept0 = (
        audit0.filter(F.col("keep") == 1)
        .select("vec_id", "cluster_id", "dist")
        .join(corpus, "vec_id")
    )
    path = str(tmp_path / f"sem_state_{quantizer}")
    similarity.save_semantic_state(kept0, cents, path, quantizer=quantizer)
    meta = json.loads((tmp_path / f"sem_state_{quantizer}" / "meta.json").read_text())
    assert meta["quantizer"] == quantizer

    copies1 = corpus.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 200_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(3.0)).alias("embedding"),
    )
    fresh1 = _blob_corpus(
        spark, n_per=10, n_clusters=1, dim=8, seed=99, base_id=300_000
    )
    a1 = {
        r["vec_id"]: r["keep"]
        for r in similarity.semantic_dedup_daily(
            copies1.unionByName(fresh1), path, threshold=0.9999
        ).collect()
    }
    copies2 = fresh1.filter(F.col("vec_id") < 300_005).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(0.5)).alias("embedding"),
    )
    fresh2 = _blob_corpus(
        spark, n_per=8, n_clusters=1, dim=8, seed=77, base_id=500_000
    )
    a2 = {
        r["vec_id"]: r["keep"]
        for r in similarity.semantic_dedup_daily(
            copies2.unionByName(fresh2), path, threshold=0.9999
        ).collect()
    }
    return a1, a2


def test_semantic_daily_keep_equality_exact_vs_ivf(spark, tmp_path):
    """On the planted blob construction (tight threshold: only exact
    collinear copies exceed it, and a copy always co-clusters with its
    original because assignment reads the normalized vector), BOTH
    days' full keep maps must be identical across the exact-Lloyd and
    sampled-MLlib builds — the production daily path changes cost, not
    decisions."""
    e1, e2 = _daily_two_day_keeps(spark, tmp_path, "exact")
    i1, i2 = _daily_two_day_keeps(spark, tmp_path, "ivf")
    assert e1 == i1
    assert e2 == i2
    # non-vacuous: day-1 prunes the collinear corpus copies, keeps the
    # fresh blob; day-2 prunes copies of day-1 keepers (the fold landed)
    assert all(e1[200_000 + i] == 0 for i in range(10))
    assert all(e1[300_000 + i] == 1 for i in range(10))
    assert all(e2[400_000 + i] == 0 for i in range(5))


def test_save_semantic_state_rejects_unknown_quantizer(spark, tmp_path):
    import pytest as _pytest

    from yellowrush_spark_ml_pipeline_spark.operators import similarity

    corpus = _blob_corpus(spark, n_per=4, n_clusters=2)
    audit0, cents = similarity.semantic_dedup_build(
        corpus, threshold=0.9999, k=2
    )
    kept0 = (
        audit0.filter(F.col("keep") == 1)
        .select("vec_id", "cluster_id", "dist")
        .join(corpus, "vec_id")
    )
    with _pytest.raises(ValueError, match="quantizer"):
        similarity.save_semantic_state(
            kept0, cents, str(tmp_path / "x"), quantizer="pq"
        )


# ---------------------------------------------------------------------------
# DSIR data selection (r12): hashed unigram+bigram importance weights
# under add-1-smoothed target/raw bucket models, deterministic top-k.
# ---------------------------------------------------------------------------


def _dsir_hand_model(target_texts, raw_texts, n_buckets):
    """Pure-Python replica of dsir_select's integer weight model."""
    import hashlib
    import math
    import re

    def feats(text):
        ws = [w for w in re.split(r"[^0-9a-zÀ-ɏ一-鿿]+",
                                  text.lower()) if w]
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % n_buckets

    def counts(texts):
        c = {}
        for t in texts:
            for f in feats(t):
                b = bucket(f)
                c[b] = c.get(b, 0) + 1
        return c

    ct, cr = counts(target_texts), counts(raw_texts)
    nt, nr = sum(ct.values()), sum(cr.values())

    def nanolog(c, n):
        # Spark/DuckDB ROUND is half-away-from-zero; ln is negative here
        x = math.log((c + 1) / (n + n_buckets)) * 1e9
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    ratio = {
        b: nanolog(ct.get(b, 0), nt) - nanolog(cr[b], nr) for b in cr
    }
    weights = []
    for i, t in enumerate(raw_texts):
        w = sum(ratio[bucket(f)] for f in feats(t))
        weights.append((i, w))
    return weights


def test_dsir_select_matches_hand_model_and_ranks_in_domain_first(spark):
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import (
        dsir_select,
    )

    # target vocabulary is distinctive; raw = 5 in-domain docs sharing it
    # + 15 off-domain docs on a disjoint vocabulary
    target_texts = [
        "protein folding dynamics entropy landscape",
        "folding pathway entropy barrier protein",
        "entropy landscape of protein folding",
    ]
    in_domain = [
        f"protein folding entropy study number {i}" for i in range(5)
    ]
    off_domain = [
        f"banana smoothie recipe blender tips volume {i}" for i in range(15)
    ]
    raw_texts = in_domain + off_domain
    target = spark.createDataFrame(
        [(i, t) for i, t in enumerate(target_texts)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(raw_texts)],
        "doc_id long, text string",
    )
    out = dsir_select(target, raw, k=20, n_buckets=256).collect()
    got = {r["doc_id"]: r["weight_nanonats"] for r in out}

    hand = _dsir_hand_model(target_texts, raw_texts, 256)
    expected = {100 + i: w for i, w in hand}
    assert got == expected

    # the 5 in-domain docs outrank every off-domain doc
    ranks = {r["doc_id"]: r["sel_rank"] for r in out}
    in_ranks = [ranks[100 + i] for i in range(5)]
    assert max(in_ranks) <= 5, ranks

    # determinism: rank is total (ties broken by id) and k bounds output
    assert sorted(r["sel_rank"] for r in out) == list(range(1, 21))


def test_dsir_single_token_docs_yield_no_bigrams(spark):
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import (
        _dsir_features,
    )

    df = spark.createDataFrame(
        [(1, "hello"), (2, "two words"), (3, "")],
        "doc_id long, text string",
    )
    rows = _dsir_features(df, "text", "doc_id").collect()
    feats = {}
    for r in rows:
        feats.setdefault(r["doc_id"], []).append(r["_f"])
    assert feats[1] == ["hello"]               # no fabricated reversed pair
    assert sorted(feats[2]) == ["two", "two words", "words"]
    assert 3 not in feats                      # empty doc -> no features
