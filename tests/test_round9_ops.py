"""Round-9 hardening tests: the ADVICE r8 edge cases (quantile_state
NULL/NaN inputs, SRP auto-width oracle coverage, k_core null endpoints,
predcache byte stability) plus the round-9 operators (BPE encode,
semantic dedup, seeded export shuffle) added further down as they land.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from yellowrush_spark_ml_pipeline_spark.operators import (
    graph,
    similarity,
    sketches,
)


# ---------------------------------------------------------------------------
# quantile_state: NULL dropped, NaN -> n_above (ADVICE r8 medium)
# ---------------------------------------------------------------------------


def test_quantile_state_null_dropped_nan_counts_above(spark):
    rows = (
        [(1, float(i)) for i in range(10)]  # 0..9 in range
        + [(1, None), (1, None)]  # NULLs: dropped, not counted
        + [(1, float("nan"))]  # NaN: counts as >= hi
        + [(1, -5.0), (1, 99.0)]  # below / above
    )
    df = spark.createDataFrame(rows, "k int, v double")
    st = sketches.quantile_state(df, ["k"], "v", lo=0.0, hi=10.0, n_bins=5)
    r = st.collect()[0]
    assert r["n_below"] == 1
    assert r["n_above"] == 2  # NaN + 99.0
    assert r["n_vals"] == 13  # 15 rows minus the 2 NULLs
    assert sum(r["bins"]) == 10


def test_quantile_state_all_null_key_disappears(spark):
    df = spark.createDataFrame(
        [(1, None), (1, None), (2, 3.0)], "k int, v double"
    )
    st = sketches.quantile_state(df, ["k"], "v", lo=0.0, hi=10.0, n_bins=5)
    rows = {r["k"]: r for r in st.collect()}
    # key 1 contributed no real values -> no state row (same as SQL
    # percentile over an all-NULL group feeding an INNER walk)
    assert set(rows) == {2}
    assert rows[2]["n_vals"] == 1


def test_quantile_state_merge_still_exact_with_nan_null(spark):
    rows_a = [(1, float(i % 7)) for i in range(40)] + [(1, None)]
    rows_b = [(1, float(i % 5)) for i in range(30)] + [(1, float("nan"))]
    a = spark.createDataFrame(rows_a, "k int, v double")
    b = spark.createDataFrame(rows_b, "k int, v double")
    args = (["k"], "v")
    kw = dict(lo=0.0, hi=8.0, n_bins=8)
    merged = sketches.merge_quantile_states(
        sketches.quantile_state(a, *args, **kw),
        sketches.quantile_state(b, *args, **kw),
    ).collect()[0]
    direct = sketches.quantile_state(a.unionByName(b), *args, **kw).collect()[0]
    # 40 + 30 reals + the NaN (counted, in n_above); the NULL is dropped
    assert merged["n_vals"] == direct["n_vals"] == 71
    assert merged["n_above"] == direct["n_above"] == 1
    assert list(merged["bins"]) == list(direct["bins"])


# ---------------------------------------------------------------------------
# SRP auto-width oracle coverage guard (ADVICE r8 low): at the oracle SF
# the banded generator must produce EVERY pair the exact all-pairs oracle
# produces — including borderline (cosine < 1) ones — under the exact
# (bits, n_tables) the driver query uses. A testdata regeneration that
# plants a pair the chosen width misses fails HERE with a name, instead
# of silently flipping the driver hash.
# ---------------------------------------------------------------------------


def test_embedding_dedup_srp_covers_exact_oracle_pairs(spark, sf_oracle):
    import __spark_entry__ as entrymod

    lsh = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in entrymod.queries()["embedding_dedup"](spark, sf_oracle).collect()
    }
    # exact all-pairs ground truth over the same planted-union input,
    # computed by brute force (no bucketing anywhere)
    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    doubled = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: (x * F.lit(2.0)).cast("float")).alias(
            "embedding"
        ),
        "label",
    )
    allv = emb.unionByName(doubled)
    from yellowrush_spark_ml_pipeline_spark.functions.vector import (
        as_double_array,
        dot,
        normalize,
    )

    v = allv.select(
        "vec_id", normalize(as_double_array(F.col("embedding"))).alias("_v")
    )
    a, b = v.alias("a"), v.alias("b")
    exact = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in (
            a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
                F.round(dot(F.col("a._v"), F.col("b._v")), 6).alias("cosine"),
            )
            .filter(F.col("cosine") >= 0.9)
        ).collect()
    }
    missed = exact - lsh
    assert not missed, (
        "SRP (bits=auto, n_tables) missed exact-oracle pairs — testdata "
        f"now contains borderline pairs the width cannot cover: {missed}"
    )
    assert lsh == exact  # no spurious pairs either


# ---------------------------------------------------------------------------
# k_core: null endpoints dropped explicitly (ADVICE r8 low)
# ---------------------------------------------------------------------------


def test_k_core_null_endpoints_dropped(spark):
    # triangle 1-2-3 (each degree 2) + null-endpoint junk edges that
    # must affect neither membership nor degree counts
    rows = [
        (1, 2), (2, 3), (1, 3),
        (None, 1), (2, None), (None, None),
    ]
    df = spark.createDataFrame(rows, "src int, dst int")
    out = {
        r["node"]: r["degree"]
        for r in graph.k_core_membership(df, k=2, rounds=3).collect()
    }
    assert out == {1: 2, 2: 2, 3: 2}


# ---------------------------------------------------------------------------
# bpe_encode: encode(train(corpus)) must equal the canonical greedy
# Python reference — token counts AND the symbol segmentation itself
# ---------------------------------------------------------------------------


def _canonical_bpe(words: dict, rounds: int):
    """Pure-Python Sennrich-2016 greedy BPE: returns (merges, vocab)
    where vocab maps word -> final symbol list."""
    from collections import Counter

    vocab = {w: list(w) for w in words}
    merges = []
    for _ in range(rounds):
        pc = Counter()
        for w, n in words.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        (l, rr), _cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((l, rr))
        for w in vocab:
            s, out, i = vocab[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == rr:
                    out.append(l + rr)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_bpe_encode_matches_canonical_reference(spark):
    import re
    from collections import Counter

    from pyspark.sql import Row

    from yellowrush_spark_ml_pipeline_spark.operators.textstats import (
        bpe_encode,
        bpe_merge_rounds,
    )

    texts = [
        "the cat sat on the mat",
        "aaaa aaaa ababab ababab ababab",
        "banana bandana banana",
        "low lower lowest low low",
        "",  # zero-token doc must survive with an empty sequence
    ]
    words = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                words[w[:24]] += 1
    rounds = 5
    _, vocab = _canonical_bpe(dict(words), rounds)
    # deterministic id table: distinct final symbols sorted asc, 1-based
    syms = sorted({s for segs in vocab.values() for s in segs})
    tid = {s: i + 1 for i, s in enumerate(syms)}

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], list(r["token_ids"]))
        for r in bpe_encode(
            df, bpe_merge_rounds(df, rounds=rounds), rounds=rounds
        ).collect()
    }
    for i, t in enumerate(texts):
        expect = []
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                expect.extend(tid[s] for s in vocab[w[:24]])
        assert got[i] == (len(expect), expect), f"doc {i}"


def test_bpe_counts_feed_pack_sequences(spark):
    """The lifecycle composition: pack by REAL bpe_encode token counts
    via the n_tokens_col hook instead of the regex proxy."""
    from pyspark.sql import Row

    from yellowrush_spark_ml_pipeline_spark.operators.textstats import (
        bpe_encode,
        bpe_merge_rounds,
        pack_sequences,
    )

    rows = [
        Row(doc_id=i, lang="en", text=("hello world " * (i + 1)).strip())
        for i in range(6)
    ]
    df = spark.createDataFrame(rows)
    enc = bpe_encode(df, bpe_merge_rounds(df, rounds=2), rounds=2)
    joined = df.join(enc.select("doc_id", F.col("n_tokens").alias("bpe_n")), "doc_id")
    packed = pack_sequences(joined, n_tokens_col="bpe_n", capacity=16)
    out = {r["doc_id"]: r for r in packed.collect()}
    enc_n = {r["doc_id"]: r["n_tokens"] for r in enc.collect()}
    assert all(out[i]["n_tokens"] == enc_n[i] for i in range(6))
    # running-sum bin assignment over the REAL counts
    cum = 0
    for i in range(6):
        assert out[i]["start_offset"] == cum
        assert out[i]["bin_id"] == cum // 16
        cum += enc_n[i]


# ---------------------------------------------------------------------------
# semantic_dedup (SemDeDup): planted collinear twins MUST collapse, with
# the canonical (centroid-nearest / smaller-id) member kept
# ---------------------------------------------------------------------------


def test_semantic_dedup_planted_twins_collapse(spark, sf_oracle):
    import __spark_entry__ as entrymod

    rows = {
        r["vec_id"]: r
        for r in entrymod.queries()["semantic_dedup"](spark, sf_oracle).collect()
    }
    planted = [i for i in range(10) if 100000 + i in rows]
    assert len(planted) == 10, "planted twins missing from output"
    for i in planted:
        orig, copy = rows[i], rows[100000 + i]
        # identical normalized vectors: same cluster, same dist
        assert orig["cluster_id"] == copy["cluster_id"]
        assert orig["dist"] == copy["dist"]
        assert orig["n_close"] >= 1 and copy["n_close"] >= 1
        # tie broken by id: the original survives, the copy is pruned
        assert orig["keep"] == 1, f"original {i} wrongly pruned"
        assert copy["keep"] == 0, f"copy of {i} not pruned"
    # non-vacuous the other way: the corpus itself survives (natural
    # max cosine ~0.5 at this SF, far below the 0.9 threshold)
    kept = sum(r["keep"] for r in rows.values())
    assert kept == len(rows) - 10


def test_semantic_dedup_auto_k_is_corpus_relative(spark):
    from pyspark.sql import Row

    import numpy as np

    rng = np.random.default_rng(7)
    n = 600
    df = spark.createDataFrame(
        [
            Row(vec_id=i, embedding=[float(x) for x in rng.normal(size=8)])
            for i in range(n)
        ]
    )
    out = similarity.semantic_dedup(
        df, threshold=0.99, k="auto", target_cluster_size=50
    )
    # ceil(600/50) = 12 clusters > the floor of 8
    assert out.select("cluster_id").distinct().count() <= 12
    assert out.agg(F.max("cluster_id")).collect()[0][0] == 11


# ---------------------------------------------------------------------------
# epoch_shuffle: deterministic seeded training order — rerun- and
# partitioning-invariant, seed-sensitive, bins contiguous
# ---------------------------------------------------------------------------


def _epoch_order(spark, sf, seed, parts=None):
    from yellowrush_spark_ml_pipeline_spark.flows import (
        epoch_shuffle,
        export_training_set,
    )

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    if parts:
        docs = docs.repartition(parts)
    dataset, _ = export_training_set(docs, hash_fn="md5")
    return {
        r["doc_id"]: r["epoch_rank"]
        for r in epoch_shuffle(dataset, seed=seed).collect()
    }


def test_epoch_shuffle_rerun_and_partitioning_invariant(spark, sf_small):
    a = _epoch_order(spark, sf_small, seed=42)
    b = _epoch_order(spark, sf_small, seed=42)
    c = _epoch_order(spark, sf_small, seed=42, parts=13)
    assert a == b == c
    assert sorted(a.values()) == list(range(1, len(a) + 1))


def test_epoch_shuffle_seed_reshuffles_but_keeps_bins_contiguous(spark, sf_small):
    from yellowrush_spark_ml_pipeline_spark.flows import (
        epoch_shuffle,
        export_training_set,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    dataset, _ = export_training_set(docs, hash_fn="md5")
    r42 = epoch_shuffle(dataset, seed=42)
    r43 = epoch_shuffle(dataset, seed=43)
    o42 = {r["doc_id"]: r["epoch_rank"] for r in r42.collect()}
    o43 = {r["doc_id"]: r["epoch_rank"] for r in r43.collect()}
    assert o42 != o43, "seed must reshuffle the epoch"
    # bins stay contiguous runs in the epoch order, docs in packing order
    rows = sorted(
        r42.select("split", "lang", "bin_id", "doc_id", "epoch_rank").collect(),
        key=lambda r: r["epoch_rank"],
    )
    seen_bins = []
    for r in rows:
        key = (r["split"], r["lang"], r["bin_id"])
        if not seen_bins or seen_bins[-1] != key:
            assert key not in seen_bins, f"bin {key} split across the epoch"
            seen_bins.append(key)
    for i in range(1, len(rows)):
        a, b = rows[i - 1], rows[i]
        if (a["split"], a["lang"], a["bin_id"]) == (b["split"], b["lang"], b["bin_id"]):
            assert a["doc_id"] < b["doc_id"], "in-bin packing order broken"


# ---------------------------------------------------------------------------
# predcache artifacts: clean re-runs must not churn bytes (VERDICT r8)
# ---------------------------------------------------------------------------


def test_publish_artifact_is_byte_stable(spark, tmp_path):
    from yellowrush_spark_ml_pipeline_spark.ml.pipelines import (
        _publish_artifact,
    )

    out = str(tmp_path / "pred")
    df = spark.createDataFrame(
        [(1, 1, 0.9), (0, 1, 0.4), (1, 0, 0.2)],
        "label int, prediction int, prob double",
    )
    _publish_artifact(df, out)
    import glob
    import os

    parts = glob.glob(os.path.join(out, "*.parquet"))
    assert parts == [os.path.join(out, "part-00000.parquet")]
    before = (open(parts[0], "rb").read(), os.stat(parts[0]).st_mtime_ns)
    # same values, different incoming row order -> old bytes kept
    _publish_artifact(df.orderBy(F.desc("prob")), out)
    after = (open(parts[0], "rb").read(), os.stat(parts[0]).st_mtime_ns)
    assert after == before
    # changed values -> artifact replaced
    _publish_artifact(
        df.withColumn("prob", F.col("prob") + 0.05), out
    )
    assert open(parts[0], "rb").read() != before[0]


# ---------------------------------------------------------------------------
# temperature_mixture_sample: deterministic temperature rebalancing
# ---------------------------------------------------------------------------


def test_temperature_mixture_flattens_and_is_partition_invariant(spark):
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import (
        temperature_mixture_sample,
    )

    # skewed mixture: source a dominates 100:10:1
    rows = (
        [(i, "a") for i in range(1000)]
        + [(10_000 + i, "b") for i in range(100)]
        + [(20_000 + i, "c") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = temperature_mixture_sample(df, "source", "doc_id").collect()
    ids = sorted(r.doc_id for r in kept)
    # pure function of the data: any partitioning yields the same rows
    ids_repart = sorted(
        r.doc_id
        for r in temperature_mixture_sample(
            df.repartition(7, "doc_id"), "source", "doc_id"
        ).collect()
    )
    assert ids == ids_repart and ids, "selection must be partition-invariant"
    # temperature alpha=1/2 flattens: the dominant source's keep-RATE is
    # strictly below the tail source's (sqrt-share weighting)
    n = {s: 0 for s in "abc"}
    for r in kept:
        n[r.source] += 1
    rate_a, rate_c = n["a"] / 1000, n["c"] / 10
    assert rate_a < rate_c, (n, "alpha=0.5 must upweight the tail source")
    # target_total=N div 2 -> roughly half the corpus survives
    assert 0.3 * len(rows) < len(kept) < 0.7 * len(rows), len(kept)


def test_temperature_mixture_explicit_target_caps_at_full_keep(spark):
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import (
        temperature_mixture_sample,
    )

    rows = [(i, "a") for i in range(50)] + [(100 + i, "b") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # target >= corpus: every rate clamps at modulus -> everything kept
    kept = temperature_mixture_sample(
        df, "source", "doc_id", target_total=10_000
    )
    assert kept.count() == len(rows)
    assert set(kept.columns) >= {"doc_id", "source", "rate_micro"}


# ---------------------------------------------------------------------------
# bpe decode / roundtrip: lifecycle losslessness + negative control
# ---------------------------------------------------------------------------


def test_bpe_roundtrip_all_ok_and_corrupted_vocab_flips(spark):
    from yellowrush_spark_ml_pipeline_spark.operators import textstats

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "low lower lowest newest widest"),
            (3, ""),
            (4, "aaa aaa bbb aaa"),
        ],
        "doc_id long, text string",
    )
    m = textstats.bpe_merge_rounds(docs, rounds=3)
    audit = textstats.bpe_roundtrip_audit(docs, m, rounds=3).collect()
    assert len(audit) == 4
    by_id = {r.doc_id: r for r in audit}
    assert all(r.roundtrip_ok for r in audit), audit
    assert by_id[3].n_tokens == 0 and by_id[3].n_chars == 0
    # decoded stream length == sum of word lengths (boundaries dropped)
    assert by_id[1].n_chars == len("thecatsatonthemat")
    # negative control: a corrupted vocabulary must FLIP the flag —
    # guards against a vacuously-true comparison
    enc = textstats.bpe_encode(docs, m, rounds=3)
    vocab = textstats.bpe_vocab(docs, m, rounds=3)
    bad_vocab = vocab.withColumn(
        "sym",
        F.when(F.col("token_id") == 1, F.lit("ZZ")).otherwise(F.col("sym")),
    )
    dec_bad = textstats.bpe_decode(enc, bad_vocab)
    good = textstats.bpe_decode(enc, vocab)
    n_diff = (
        dec_bad.alias("b")
        .join(good.alias("g"), "doc_id")
        .filter(F.col("b.decoded_chars") != F.col("g.decoded_chars"))
        .count()
    )
    assert n_diff > 0, "corrupting the vocab must change some decode"


# ---------------------------------------------------------------------------
# dq_report hybrid shape: all three probe shapes agree (crossover probe)
# ---------------------------------------------------------------------------


def test_dq_shapes_identical_output(spark, sf_small):
    """The shipped hybrid must report exactly the same (check, violations)
    rows as the refuted full-fusion shape and the pre-r7 unfused shape —
    the crossover probe (tools/dq_crossover.py) asserts this per scale at
    probe time; this pins it in the suite."""
    from tools.dq_crossover import full_fusion, hybrid, unfused

    ref = sorted(map(tuple, full_fusion(spark, sf_small).collect()))
    assert ref, "fusion shape returned no rows"
    for shape in (unfused, hybrid):
        got = sorted(map(tuple, shape(spark, sf_small).collect()))
        assert got == ref, (shape.__name__, got, ref)
