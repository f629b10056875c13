"""Round-4 third-wave operator tests: session co-visitation pairs and
per-source KL drift. Planted ground truth — no vacuous greens."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from yellowrush_spark_ml_pipeline_spark.operators.events import co_visitation
from yellowrush_spark_ml_pipeline_spark.operators.textstats import source_kl_drift


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _ts(minute):
    return dt.datetime(2024, 1, 1, 10, minute)


# -------------------------------------------------------------- co_visitation


def test_co_visitation_planted_pairs(spark):
    """User 1 has two sessions (gap > 30 min splits them): {view, cart,
    buy} then {view, cart}; user 2 has one session {view, buy}. Expected
    canonical pair counts: (cart,view)=2, (buy,view)=2, (buy,cart)=1."""
    rows = [
        # user 1, session A: view, cart, buy within minutes
        (1, _ts(0), 1, "view"),
        (2, _ts(1), 1, "cart"),
        (3, _ts(2), 1, "buy"),
        # user 1, session B: 40-minute gap -> new session
        (4, _ts(42), 1, "view"),
        (5, _ts(43), 1, "cart"),
        # user 2, single session
        (6, _ts(0), 2, "view"),
        (7, _ts(5), 2, "buy"),
    ]
    got = {
        (r.type_a, r.type_b): r.n_sessions
        for r in co_visitation(_ev(spark, rows), k=10).collect()
    }
    assert got == {
        ("cart", "view"): 2,
        ("buy", "view"): 2,
        ("buy", "cart"): 1,
    }


def test_co_visitation_counts_each_session_once(spark):
    """Repeated events of the same type inside one session must not
    inflate the pair count (distinct BEFORE the self-join)."""
    rows = [
        (1, _ts(0), 1, "view"),
        (2, _ts(1), 1, "view"),
        (3, _ts(2), 1, "view"),
        (4, _ts(3), 1, "buy"),
        (5, _ts(4), 1, "buy"),
    ]
    got = co_visitation(_ev(spark, rows), k=10).collect()
    assert len(got) == 1
    assert (got[0].type_a, got[0].type_b, got[0].n_sessions) == ("buy", "view", 1)


def test_co_visitation_canonical_orientation(spark):
    """Pair orientation is lexicographic (type_a < type_b) regardless of
    event order inside the session."""
    rows = [
        (1, _ts(0), 1, "zeta"),
        (2, _ts(1), 1, "alpha"),
    ]
    got = co_visitation(_ev(spark, rows), k=10).collect()
    assert (got[0].type_a, got[0].type_b) == ("alpha", "zeta")


# ------------------------------------------------------------ source_kl_drift


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_source_kl_drift_identical_source_scores_zero(spark):
    """Two sources with the SAME token distribution: both KL = 0 (every
    log-ratio term is ln(1) = 0)."""
    rows = [
        (1, "alpha beta alpha beta", "s1"),
        (2, "alpha beta alpha beta", "s2"),
    ]
    got = {r.source: r for r in source_kl_drift(_docs(spark, rows)).collect()}
    assert got["s1"].n_tokens == 4 and got["s2"].n_tokens == 4
    assert got["s1"].kl_nats == 0.0
    assert got["s2"].kl_nats == 0.0


def test_source_kl_drift_matches_closed_form(spark):
    """Planted two-source corpus checked against the hand-computed KL.

    s1 = 3x'a' + 1x'b'; s2 = 1x'a' + 3x'b'. Corpus: p(a)=p(b)=1/2.
    KL(s1||corpus) = 0.75*ln(1.5) + 0.25*ln(0.5) — identically for s2
    by symmetry."""
    rows = [
        (1, "a a a b", "s1"),
        (2, "a b b b", "s2"),
    ]
    expected = 0.75 * math.log(0.75 / 0.5) + 0.25 * math.log(0.25 / 0.5)
    got = {r.source: r for r in source_kl_drift(_docs(spark, rows)).collect()}
    for s in ("s1", "s2"):
        assert got[s].n_tokens == 4
        assert abs(got[s].kl_nats - expected) < 1e-6, (s, got[s].kl_nats, expected)


def test_source_kl_drift_flags_the_divergent_source(spark):
    """Three sources, one pathological (token soup no other source has):
    the drifted source must score strictly highest."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "clean_a"),
        (2, "the quick brown fox rests under the old tree", "clean_b"),
        (3, "zxq1 vbn2 plm3 qwe4 zxq1 vbn2 plm3 qwe4", "spam"),
    ]
    got = {r.source: r.kl_nats for r in source_kl_drift(_docs(spark, rows)).collect()}
    assert got["spam"] > got["clean_a"]
    assert got["spam"] > got["clean_b"]
    assert all(v >= 0.0 for v in got.values())
