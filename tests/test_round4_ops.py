"""Round-4 operator tests: event transitions, first-touch attribution,
EWMA / rolling z-score, cross-document duplicate n-gram spans, unpivot,
grouping sets. Planted ground truth — no vacuous greens."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from yellowrush_spark_ml_pipeline_spark.operators import dedup, timeseries
from yellowrush_spark_ml_pipeline_spark.operators.events import (
    event_transitions,
    first_touch_attribution,
)


def _events(spark, rows):
    """rows: (event_id, ts_offset_minutes, user_id, event_type, value)"""
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (eid, base + dt.timedelta(minutes=m), uid, et, float(v))
            for eid, m, uid, et, v in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_event_transitions_planted_chain(spark):
    ev = _events(
        spark,
        [
            (1, 0, 1, "view", 0),
            (2, 1, 1, "click", 0),
            (3, 2, 1, "purchase", 0),
            (4, 0, 2, "view", 0),
            (5, 1, 2, "click", 0),
            (6, 0, 3, "view", 0),
            (7, 1, 3, "view", 0),
        ],
    )
    out = {
        (r.prev_type, r.next_type): (r.n_transitions, r.p_next)
        for r in event_transitions(ev).collect()
    }
    assert out[("view", "click")][0] == 2
    assert out[("click", "purchase")][0] == 1
    assert out[("view", "view")][0] == 1
    # row-normalized: view -> {click: 2/3, view: 1/3}
    assert abs(out[("view", "click")][1] - 2 / 3) < 1e-12
    assert abs(out[("view", "view")][1] - 1 / 3) < 1e-12


def test_event_transitions_tie_determinism(spark):
    """Same-timestamp events order by event_id — the transition set is a
    function of the data, not the partitioning."""
    ev = _events(
        spark,
        [(1, 0, 1, "a", 0), (2, 0, 1, "b", 0), (3, 0, 1, "c", 0)],
    )
    a = sorted(
        (r.prev_type, r.next_type)
        for r in event_transitions(ev).collect()
    )
    b = sorted(
        (r.prev_type, r.next_type)
        for r in event_transitions(ev.repartition(7)).collect()
    )
    assert a == b == [("a", "b"), ("b", "c")]


def test_first_touch_attribution_planted(spark):
    ev = _events(
        spark,
        [
            # user 1: first touch "ad", purchases 10 + 5
            (1, 0, 1, "ad", 0),
            (2, 5, 1, "purchase", 10.0),
            (3, 9, 1, "purchase", 5.0),
            # user 2: first touch "email", purchase 7
            (4, 0, 2, "email", 0),
            (5, 3, 2, "purchase", 7.0),
            # user 3: first touch "ad", no purchase -> excluded
            (6, 0, 3, "ad", 0),
        ],
    )
    out = {r.first_touch: r for r in first_touch_attribution(ev).collect()}
    assert out["ad"].n_converted_users == 1
    assert out["ad"].n_conversions == 2
    assert out["ad"].attributed_value == 15.0
    assert out["email"].attributed_value == 7.0
    assert set(out) == {"ad", "email"}


def test_ewma_constant_series_is_identity(spark):
    rows = [(i, i * 1440, 1, "t", 5.0) for i in range(10)]  # one event/day
    out = timeseries.ewma(_events(spark, rows)).collect()
    assert len(out) == 10
    for r in out:
        assert abs(r.ewma - 5.0) < 1e-9  # weighted avg of a constant


def test_ewma_matches_python_reference(spark):
    vals = [10.0, 20.0, 40.0, 30.0, 50.0]
    rows = [(i, i * 1440, 1, "t", vals[i]) for i in range(len(vals))]
    out = sorted(timeseries.ewma(_events(spark, rows)).collect(),
                 key=lambda r: r.day)
    for t, r in enumerate(out):
        num = sum(0.8**j * vals[t - j] for j in range(7) if t - j >= 0)
        den = sum(0.8**j for j in range(7) if t - j >= 0)
        assert abs(r.ewma - num / den) < 1e-6


def test_rolling_zscore_flags_planted_spike(spark):
    vals = [10.0] * 9 + [100.0]  # spike on the last day
    rows = [(i, i * 1440, 1, "t", vals[i]) for i in range(len(vals))]
    out = sorted(timeseries.rolling_zscore(_events(spark, rows)).collect(),
                 key=lambda r: r.day)
    assert not any(r.anomaly for r in out[:-1])  # constant window: z NULL
    assert out[-1].anomaly and out[-1].zscore > 2


def test_dup_ngram_spans_planted_copy(spark):
    common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, f"{common} unique one tail words here"),
            (2, f"other prefix words {common} closing"),
            (3, "entirely different text with no overlap at all present"),
        ],
        "doc_id long, text string",
    )
    out = dedup.duplicate_ngram_spans(docs, ngram_n=8, min_docs=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 3 shares nothing
    assert 3 not in by_doc
    # common block = 10 tokens -> 8-grams at doc-1 positions 0..2 fully
    # inside the block; doc 2 has them shifted by its 3-token prefix
    spans1 = by_doc[1]
    assert len(spans1) == 1 and spans1[0].span_start == 0
    assert spans1[0].n_dup_grams == 3
    spans2 = by_doc[2]
    assert len(spans2) == 1 and spans2[0].span_start == 3
    assert spans2[0].n_dup_grams == 3


def test_dup_ngram_spans_merges_adjacent_runs(spark):
    """Two docs sharing two DISJOINT blocks produce two separate spans."""
    b1 = "one two three four five six seven eight nine ten"
    b2 = "red orange yellow green blue indigo violet black white gray"
    docs = spark.createDataFrame(
        [
            (1, f"{b1} xx1 yy1 zz1 qq1 ww1 ee1 rr1 tt1 {b2}"),
            (2, f"{b1} aa2 bb2 cc2 dd2 ff2 gg2 hh2 jj2 {b2}"),
        ],
        "doc_id long, text string",
    )
    out = dedup.duplicate_ngram_spans(docs, ngram_n=8, min_docs=2).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    assert len(per_doc[1]) == 2 and len(per_doc[2]) == 2


def test_daily_series_plan_has_no_python(spark, sf_oracle):
    from yellowrush_spark_ml_pipeline_spark.sources import load_table

    ev = load_table(spark, sf_oracle, "events")
    for df in (timeseries.ewma(ev), timeseries.rolling_zscore(ev)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        # one exchange to the (key, day) grid + one for the key window
        assert plan.count("Exchange") <= 2


def test_unigram_nll_rare_tokens_score_higher(spark):
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import (
        unigram_nll,
    )

    docs = spark.createDataFrame(
        [
            (1, "common common common common common common"),
            (2, "common common common common rare1 rare2"),
            (3, "rare3 rare4 rare5 rare6 rare7 rare8"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_nll(docs).collect()}
    # corpus: 'common' 10/18, each rare 1/18
    import math

    p_common = 10 / 18
    exp1 = -math.log(p_common)
    assert abs(out[1].avg_nll - exp1) < 1e-6
    assert out[1].avg_nll < out[2].avg_nll < out[3].avg_nll
    assert out[3].avg_nll - (-math.log(1 / 18)) < 1e-6
    assert out[1].n_tokens == 6


def test_dedup_consensus_signals_have_complementary_blind_spots(spark, sf_oracle):
    """The consensus claim, proven: token-SORTED twins must be invisible
    to shingle MinHash (word order destroyed) but hamming-0 for SimHash;
    the union must group both twin classes."""
    from yellowrush_spark_ml_pipeline_spark.functions.text import tokens as tok_fn
    from yellowrush_spark_ml_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_oracle, "documents").select("doc_id", "text")
    sorted_twins = docs.filter(F.col("doc_id") < 15).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.array_join(F.array_sort(tok_fn(F.col("text"))), " ").alias("text"),
    )
    aug = docs.unionByName(sorted_twins)
    mh = dedup.minhash_dedup_pairs(
        aug, jaccard_threshold=0.4, hash_fn="md5"
    )
    mh_pairs = {(r.id_a, r.id_b) for r in mh.collect()}
    sims = dedup.simhash(aug, hash_fn="md5")
    sh_pairs = {
        (r.id_a, r.id_b)
        for r in dedup.simhash_candidates(
            sims, max_hamming=3, blocks=4, bits=60
        ).collect()
    }
    twin_pairs = {(d, d + 300000) for d in range(15)}
    assert not (twin_pairs & mh_pairs), "shingle MinHash should miss sorted twins"
    assert twin_pairs <= sh_pairs, "order-free SimHash must catch every sorted twin"
