"""Round-4 second-wave operator tests: blocked fuzzy ER join, interval
concurrency sweep-line, mergeable partial-aggregate state, weighted
priority sampling. Planted ground truth — no vacuous greens."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from yellowrush_spark_ml_pipeline_spark.operators import aggregates, cleaning
from yellowrush_spark_ml_pipeline_spark.operators.dedup import fuzzy_pairs
from yellowrush_spark_ml_pipeline_spark.operators.events import (
    interval_concurrency,
)


# ---------------------------------------------------------------- fuzzy_pairs


def _keys(spark, rows, id_name):
    return spark.createDataFrame(rows, f"{id_name} long, key string")


def test_fuzzy_pairs_finds_every_single_edit_kind(spark):
    """Substitution / insertion / deletion at front, middle, and back —
    the two-ended pigeonhole must catch all of them (edits at the FRONT
    break the prefix block; the suffix block must recover them, and vice
    versa)."""
    base = "the quick brown fox jumps over the lazy dog tonight"
    left = _keys(spark, [(1, base)], "id_a")
    right = _keys(
        spark,
        [
            (10, "Xhe quick brown fox jumps over the lazy dog tonight"),  # sub front
            (11, "the quick brown fox jumps Xver the lazy dog tonight"),  # sub mid
            (12, "the quick brown fox jumps over the lazy dog tonighX"),  # sub back
            (13, "Zthe quick brown fox jumps over the lazy dog tonight"),  # ins front
            (14, "the quick brown fox jumZps over the lazy dog tonight"),  # ins mid
            (15, "the quick brown fox jumps over the lazy dog tonightZ"),  # ins back
            (16, "he quick brown fox jumps over the lazy dog tonight"),  # del front
            (17, "the quick brown fox jmps over the lazy dog tonight"),  # del mid
            (18, "the quick brown fox jumps over the lazy dog tonigh"),  # del back
            (19, "a completely different sentence about data engines"),  # no match
            (20, base),  # exact (distance 0)
        ],
        "id_b",
    )
    got = {
        (r.id_a, r.id_b): r.edit_distance
        for r in fuzzy_pairs(left, right, "key", "id_a", "id_b").collect()
    }
    assert set(got) == {(1, b) for b in range(10, 19)} | {(1, 20)}
    assert got[(1, 20)] == 0
    assert all(d == 1 for (_, b), d in got.items() if b != 20)


def test_fuzzy_pairs_rejects_short_keys_loudly(spark):
    left = _keys(spark, [(1, "short key")], "id_a")  # len 9 <= 16
    right = _keys(spark, [(2, "another key that is long enough here")], "id_b")
    with pytest.raises(Exception, match="fuzzy_pairs requires"):
        fuzzy_pairs(left, right, "key", "id_a", "id_b").collect()


def test_fuzzy_pairs_max_dist_contract(spark):
    with pytest.raises(ValueError, match="max_dist=1"):
        fuzzy_pairs(None, None, "key", "id_a", "id_b", max_dist=2)


def test_fuzzy_pairs_block_cap_drops_mega_blocks(spark):
    """With max_block_size, a prefix shared by too many left keys stops
    generating candidates (the skew guard); pairs blocked only through
    the capped block disappear."""
    shared = "identical prefix then tail number %02d of the block"
    left = _keys(spark, [(i, shared % i) for i in range(30)], "id_a")
    right = _keys(spark, [(100, shared % 0)], "id_b")
    uncapped = fuzzy_pairs(left, right, "key", "id_a", "id_b").count()
    capped = fuzzy_pairs(
        left, right, "key", "id_a", "id_b", max_block_size=5
    ).count()
    assert uncapped >= 1
    assert capped == 0


# ------------------------------------------------------ interval_concurrency


def _ev(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(k, base + dt.timedelta(minutes=m)) for k, m in rows],
        "event_type string, ts timestamp",
    )


def test_interval_concurrency_planted_peak(spark):
    """Three overlapping 10-min intervals at minutes 0, 5, 9 → peak 3 at
    minute 9; a lone later interval doesn't raise it."""
    ev = _ev(spark, [("a", 0), ("a", 5), ("a", 9), ("a", 30)])
    row = interval_concurrency(ev, duration_minutes=10).collect()[0]
    assert row.peak_concurrency == 3
    assert row.peak_at == dt.datetime(2024, 1, 1, 0, 9)


def test_interval_concurrency_half_open_back_to_back(spark):
    """[0,10) and [10,20) never overlap: the -1 close sorts before the
    +1 open at t=10, so peak stays 1."""
    ev = _ev(spark, [("a", 0), ("a", 10)])
    row = interval_concurrency(ev, duration_minutes=10).collect()[0]
    assert row.peak_concurrency == 1


def test_interval_concurrency_simultaneous_starts_collapse(spark):
    """Events at the same instant are peers under the RANGE frame: both
    count toward one cumulative value (peak 2), engine-order-independent."""
    ev = _ev(spark, [("a", 0), ("a", 0)])
    row = interval_concurrency(ev, duration_minutes=10).collect()[0]
    assert row.peak_concurrency == 2
    assert row.peak_at == dt.datetime(2024, 1, 1)


def test_interval_concurrency_keys_independent(spark):
    ev = _ev(spark, [("a", 0), ("a", 1), ("b", 0)])
    out = {
        r.event_type: r.peak_concurrency
        for r in interval_concurrency(ev, duration_minutes=10).collect()
    }
    assert out == {"a": 2, "b": 1}


# ----------------------------------------------------- mergeable agg state


def _vals(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, k, base + dt.timedelta(days=d), v)
            for i, (k, d, v) in enumerate(rows)
        ],
        "event_id long, event_type string, ts timestamp, value double",
    )


def _day(df):
    return df.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        "value",
        "event_id",
    )


def test_merge_agg_states_equals_full_recompute(spark):
    rows = [("a", 0, 1.5), ("a", 0, 2.25), ("a", 1, -3.0), ("b", 0, 10.0),
            ("a", 0, 4.75), ("b", 1, None), ("b", 0, 0.5)]
    df = _day(_vals(spark, rows))
    old = df.filter(F.col("event_id") % 2 == 0)
    new = df.filter(F.col("event_id") % 2 == 1)
    merged = aggregates.finalize_agg_state(
        aggregates.merge_agg_states(
            aggregates.partial_agg_state(old, ["event_type", "day"], "value"),
            aggregates.partial_agg_state(new, ["event_type", "day"], "value"),
        )
    )
    direct = aggregates.finalize_agg_state(
        aggregates.partial_agg_state(df, ["event_type", "day"], "value")
    )
    key = lambda r: (r.event_type, r.day)  # noqa: E731
    got = {key(r): r.asDict() for r in merged.collect()}
    want = {key(r): r.asDict() for r in direct.collect()}
    assert got == want
    # spot-check a hand value: a/day0 = 1.5 + 2.25 + 4.75 = 8.5, mean 8.5/3
    a0 = got[("a", dt.date(2024, 1, 1))]
    assert a0["n_rows"] == 3 and a0["sum_val"] == 8.5
    assert a0["mean_val"] == 8.5 / 3
    # null-only values still count rows, not vals
    b1 = got[("b", dt.date(2024, 1, 2))]
    assert b1["n_rows"] == 1 and b1["n_vals"] == 0 and b1["sum_val"] is None


def test_merge_agg_states_chains_and_is_shape_stable(spark):
    """Three-way merge (backfill day) has the same schema as its inputs,
    so states chain across arbitrarily many batches."""
    df = _day(_vals(spark, [("a", 0, 1.0), ("a", 0, 2.0), ("a", 0, 4.0)]))
    parts = [
        aggregates.partial_agg_state(
            df.filter(F.col("event_id") == i), ["event_type", "day"], "value"
        )
        for i in range(3)
    ]
    merged = aggregates.merge_agg_states(*parts)
    assert merged.columns == parts[0].columns
    row = aggregates.finalize_agg_state(merged).collect()[0]
    assert row.n_rows == 3 and row.sum_val == 7.0 and row.min_val == 1.0


# -------------------------------------------------- weighted_priority_sample


def test_weighted_priority_sample_exact_set_and_invariance(spark):
    """The surviving set is a pure function of (id, weight): recomputing
    under a different partitioning yields the IDENTICAL row set, and it
    equals a local Python replay of the priority formula."""
    rows = [(i, float(1 + (i * 37) % 100)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = {
        r.doc_id for r in
        cleaning.weighted_priority_sample(df, "w", k=50, id_col="doc_id").collect()
    }
    out_repart = {
        r.doc_id for r in
        cleaning.weighted_priority_sample(
            df.repartition(13), "w", k=50, id_col="doc_id"
        ).collect()
    }
    p = 2_147_483_647
    pri = {
        i: w / (((i % p) * 48271 % p + 1) / float(p + 1)) for i, w in rows
    }
    want = set(sorted(pri, key=lambda i: (-pri[i], i))[:50])
    assert out == want == out_repart


def test_weighted_priority_sample_weight_bias(spark):
    """Heavier rows are picked far more often: with weights 100 vs 1 at
    a 10% sample, almost all survivors come from the heavy class."""
    rows = [(i, 100.0 if i < 500 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = [
        r.doc_id for r in
        cleaning.weighted_priority_sample(df, "w", k=100, id_col="doc_id").collect()
    ]
    heavy = sum(1 for i in out if i < 500)
    assert heavy >= 90


def test_weighted_priority_sample_excludes_nonpositive(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)], "doc_id long, w double"
    )
    out = cleaning.weighted_priority_sample(df, "w", k=10, id_col="doc_id")
    assert [r.doc_id for r in out.collect()] == [1]


# ------------------------------------------------------------- rrf / bm25


def test_rrf_fuse_hand_computed(spark):
    """Two 2-item rank lists with one shared candidate: fused scores are
    exactly 1/(60+ra) + 1/(60+rb); solo candidates take a single term."""
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, vec_id long, rank int"
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2)], "query_id long, vec_id long, rank int"
    )
    from yellowrush_spark_ml_pipeline_spark.operators.similarity import rrf_fuse

    got = {r.vec_id: (r.rank, r.rrf_score) for r in rrf_fuse(a, b, k=3).collect()}
    assert got[11] == (1, 1 / 62 + 1 / 61)  # rank 2 in A, rank 1 in B
    assert got[10] == (2, 1 / 61)
    assert got[12] == (3, 1 / 62)


def test_rrf_fusion_promotes_consensus(spark, sf_oracle):
    """On real embeddings the fused top-1 for each query is the query
    itself (both rankers agree), and every fused list has exactly 10
    rows."""
    import __spark_entry__ as entrymod

    rows = entrymod.q_rrf_fusion(spark, sf_oracle).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for qid, lst in by_q.items():
        assert len(lst) == 10
        top = min(lst, key=lambda r: r.rank)
        assert top.vec_id == qid  # self-match wins both rankers


def test_bm25_prefers_term_dense_short_docs(spark):
    """Classic BM25 behavior: among docs containing the term, higher tf
    and shorter length score higher; docs without any term are absent."""
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark"),             # tf=3, dl=3
            (2, "spark filler filler filler"),    # tf=1, dl=4
            (3, "spark spark filler filler"),     # tf=2, dl=4
            (4, "entirely unrelated words here"),  # no match
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["spark"], k=10).collect()
    ids = [r.doc_id for r in out]
    assert ids == [1, 3, 2]
    assert all(r.n_terms_matched == 1 for r in out)


def test_bm25_multi_term_coverage_beats_repetition(spark):
    """A doc matching ALL query terms outranks one repeating a single
    term (idf terms add across DISTINCT matched terms)."""
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma filler"),
            (2, "alpha alpha alpha alpha"),
            (3, "beta filler filler filler"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["alpha", "beta", "gamma"], k=10).collect()
    assert out[0].doc_id == 1 and out[0].n_terms_matched == 3


# ------------------------------------------------------------ session_stats


def test_session_stats_planted_sessions(spark):
    """User 1: events at 0/10/20 min (one session), then 120 min (new
    session, bounce). Durations are exact epoch-second integers."""
    from yellowrush_spark_ml_pipeline_spark.operators.events import session_stats

    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, base, 1, "view"),
            (2, base + dt.timedelta(minutes=10), 1, "click"),
            (3, base + dt.timedelta(minutes=20), 1, "view"),
            (4, base + dt.timedelta(minutes=120), 1, "view"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = {
        r.session_id: r.asDict()
        for r in session_stats(ev, gap_minutes=30).collect()
    }
    assert got[1]["n_events"] == 3
    assert got[1]["duration_sec"] == 1200
    assert got[1]["n_types"] == 2
    assert got[1]["is_bounce"] == 0
    assert got[2]["n_events"] == 1 and got[2]["is_bounce"] == 1


# --------------------------------------------------- source_ngram_overlap


def test_source_overlap_planted_shared_grams(spark):
    """Sources A and B share a 5-token banner (three 3-grams); C is
    disjoint. Only the (A, B) pair appears, with exact counts."""
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import (
        source_ngram_overlap,
    )

    docs = spark.createDataFrame(
        [
            (1, "A", "the shared banner text here plus alpha beta"),
            (2, "B", "the shared banner text here plus gamma delta"),
            (3, "C", "totally different words in every position now"),
        ],
        "doc_id long, source string, text string",
    )
    rows = source_ngram_overlap(docs, ngram_n=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.source_a, r.source_b) == ("A", "B")
    # shared grams: the 4 overlapping 3-grams of the 6 shared tokens
    # "the shared banner text here plus"
    assert r.n_common == 4
    assert r.n_a == 6 and r.n_b == 6  # 8 tokens -> 6 grams each
    assert r.jaccard == 4 / (6 + 6 - 4)


# ------------------------------------------------------------- skyline_2d


def test_skyline_2d_hand_frontier(spark):
    """Points (1,5) (3,3) (5,1) form the frontier; (2,2) and (3,3)-dup
    and (1,4) are dominated or merged."""
    from yellowrush_spark_ml_pipeline_spark.operators.aggregates import skyline_2d

    pts = [(1, 5), (3, 3), (5, 1), (2, 2), (1, 4), (3, 3)]
    df = spark.createDataFrame(pts, "x long, y long")
    out = {(r.x, r.y): r.n_rows for r in skyline_2d(df, "x", "y").collect()}
    assert out == {(1, 5): 1, (3, 3): 2, (5, 1): 1}


def test_skyline_2d_bucket_invariance(spark):
    """The frontier is identical for any bucket count — the hash prunes,
    never changes the result."""
    from yellowrush_spark_ml_pipeline_spark.operators.aggregates import skyline_2d

    import random

    rng = random.Random(7)
    pts = [(rng.randrange(1000), rng.randrange(1000)) for _ in range(500)]
    df = spark.createDataFrame(pts, "x long, y long")
    a = {(r.x, r.y) for r in skyline_2d(df, "x", "y", buckets=1).collect()}
    b = {(r.x, r.y) for r in skyline_2d(df, "x", "y", buckets=64).collect()}
    # brute-force reference
    want = {
        (x, y)
        for x, y in set(pts)
        if not any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y)) for x2, y2 in pts
        )
    }
    assert a == b == want


# --------------------------------------------------------- conversion_lag


def test_conversion_lag_planted(spark):
    """User 1 converts 90 min after first view (bucket 1), user 2 in 10
    min (bucket 0), user 3 never converts, user 4 converts BEFORE any
    view (excluded by the lag >= 0 guard)."""
    from yellowrush_spark_ml_pipeline_spark.operators.events import conversion_lag

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 0, 1, "view"), (2, 90, 1, "purchase"),
        (3, 0, 2, "view"), (4, 10, 2, "purchase"),
        (5, 0, 3, "view"),
        (6, 0, 4, "purchase"), (7, 10, 4, "view"),
    ]
    ev = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=m), u, t) for i, m, u, t in rows],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = {r.lag_bucket: r.asDict() for r in conversion_lag(ev).collect()}
    assert set(got) == {0, 1}
    assert got[0]["n_users"] == 1 and got[0]["min_lag_sec"] == 600
    assert got[1]["n_users"] == 1 and got[1]["min_lag_sec"] == 5400


# ---------------------------------------------------------- ngram_novelty


def test_ngram_novelty_first_seer_gets_credit(spark):
    """Doc 1 is all-novel (first seer); doc 2 copies doc 1 exactly
    (novelty 0); doc 3 is half-copy half-new."""
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import ngram_novelty

    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9"            # 2 distinct 8-grams
    fresh = "n1 n2 n3 n4 n5 n6 n7 n8 n9"
    docs = spark.createDataFrame(
        [(1, a), (2, a), (3, a + " " + fresh)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.asDict() for r in ngram_novelty(docs, ngram_n=8).collect()}
    assert got[1]["n_grams"] == 2 and got[1]["novelty"] == 1.0
    assert got[2]["novelty"] == 0.0
    # doc 3: 11 grams total (18 tokens -> 11 8-grams); the first 2 are
    # doc 1's, the other 9 cross into the fresh tail -> novel
    assert got[3]["n_grams"] == 11
    assert got[3]["n_novel"] == 9
    assert got[3]["novelty"] == 9 / 11


# --------------------------------------------------------- table_checksum


def test_table_checksum_detects_single_row_change(spark):
    """Parity audit property: identical tables agree per group; flipping
    ONE value flips exactly that group's checksum (n_rows unchanged),
    and row ORDER never matters."""
    rows = [(1, "a", 10.0, "g1"), (2, "b", 20.0, "g1"), (3, "c", 30.0, "g2")]
    schema = "id long, s string, v double, grp string"
    df = spark.createDataFrame(rows, schema)
    base = {
        r.grp: (r.n_rows, r.checksum)
        for r in aggregates.table_checksum(
            df, ["id", "s", "v"], ["grp"]
        ).collect()
    }
    shuffled = spark.createDataFrame(list(reversed(rows)), schema).repartition(7)
    same = {
        r.grp: (r.n_rows, r.checksum)
        for r in aggregates.table_checksum(
            shuffled, ["id", "s", "v"], ["grp"]
        ).collect()
    }
    assert base == same
    mutated = spark.createDataFrame(
        [(1, "a", 10.5, "g1"), (2, "b", 20.0, "g1"), (3, "c", 30.0, "g2")],
        schema,
    )
    diff = {
        r.grp: (r.n_rows, r.checksum)
        for r in aggregates.table_checksum(
            mutated, ["id", "s", "v"], ["grp"]
        ).collect()
    }
    assert diff["g2"] == base["g2"]
    assert diff["g1"][0] == base["g1"][0] and diff["g1"][1] != base["g1"][1]


def test_table_checksum_null_vs_empty_distinct(spark):
    """NULL and '' must hash differently (the classic canonicalization
    trap), and a global (ungrouped) checksum works."""
    a = spark.createDataFrame([(1, None)], "id long, s string")
    b = spark.createDataFrame([(1, "")], "id long, s string")
    ca = aggregates.table_checksum(a, ["id", "s"]).collect()[0]
    cb = aggregates.table_checksum(b, ["id", "s"]).collect()[0]
    assert ca.n_rows == cb.n_rows == 1
    assert ca.checksum != cb.checksum
