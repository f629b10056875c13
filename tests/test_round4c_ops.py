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


# ---------------------------------------------------------- containment_pairs


from yellowrush_spark_ml_pipeline_spark.operators.dedup import (  # noqa: E402
    containment_pairs,
)


def _cdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_catches_excerpt_jaccard_misses(spark):
    """A 6-token excerpt of a 60-token doc: containment 1.0 (all excerpt
    grams in the parent) while Jaccard is ~0.07 — the operator's reason
    to exist."""
    parent_words = " ".join(f"w{i}" for i in range(60))
    excerpt = " ".join(f"w{i}" for i in range(6))
    rows = [(1, parent_words), (2, excerpt)]
    got = containment_pairs(_cdocs(spark, rows), threshold=0.9).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.containment == 1.0
    assert r.n_a == 58 and r.n_b == 4  # 60->58 and 6->4 trigram shingles
    # and Jaccard would have been far below any dedup threshold
    assert r.n_b / (r.n_a + r.n_b - r.n_b) < 0.1


def test_containment_unrelated_docs_not_paired(spark):
    rows = [
        (1, " ".join(f"a{i}" for i in range(30))),
        (2, " ".join(f"b{i}" for i in range(30))),
    ]
    assert containment_pairs(_cdocs(spark, rows), threshold=0.5).collect() == []


def test_containment_df_cap_drops_boilerplate_blowup(spark):
    """A banner gram shared by 30 docs exceeds max_gram_df=10 and must
    not produce candidates by itself; two docs sharing RARE grams still
    pair up."""
    banner = "subscribe to our newsletter today please"
    rows = [(i, banner) for i in range(1, 31)]
    rows.append((100, "rare alpha beta gamma delta epsilon zeta"))
    rows.append((101, "rare alpha beta gamma delta epsilon zeta extra tail words"))
    got = containment_pairs(
        _cdocs(spark, rows), threshold=0.9, max_gram_df=10
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in got}
    assert (100, 101) in pairs
    assert all(a == 100 and b == 101 for a, b in pairs), pairs


def test_containment_threshold_boundary(spark):
    """9 of 10 excerpt grams present -> containment 0.9 passes at 0.9;
    raising the threshold above it excludes the pair."""
    parent = " ".join(f"w{i}" for i in range(40))
    # 12 tokens: first 11 from parent, last one foreign -> 10 shingles,
    # 9 fully inside the parent, 1 containing the foreign token... build
    # explicitly: tokens w0..w10 + xx -> shingles w0w1w2..w9w10xx (10), 9 match
    excerpt = " ".join([f"w{i}" for i in range(11)] + ["xx"])
    rows = [(1, parent), (2, excerpt)]
    got = containment_pairs(_cdocs(spark, rows), threshold=0.9).collect()
    assert len(got) == 1 and got[0].containment == 0.9
    assert containment_pairs(_cdocs(spark, rows), threshold=0.91).collect() == []


# -------------------------------------------------------- linear_attribution


from yellowrush_spark_ml_pipeline_spark.operators.events import (  # noqa: E402
    linear_attribution,
)


def test_linear_attribution_splits_credit_exactly(spark):
    """User 1 touches view+click then purchases (500000 micro each);
    user 2 touches only view (1000000); user 3 purchases with no prior
    touches (contributes nothing); user 4 never converts."""
    rows = [
        (1, _ts(0), 1, "view"),
        (2, _ts(1), 1, "click"),
        (3, _ts(2), 1, "purchase"),
        (4, _ts(0), 2, "view"),
        (5, _ts(1), 2, "purchase"),
        (6, _ts(0), 3, "purchase"),
        (7, _ts(0), 4, "view"),
        (8, _ts(1), 4, "click"),
    ]
    got = {
        r.channel: (r.n_conversions, r.micro_credits)
        for r in linear_attribution(_ev(spark, rows)).collect()
    }
    assert got == {"view": (2, 1_500_000), "click": (1, 500_000)}


def test_linear_attribution_first_conversion_only_and_strictly_before(spark):
    """Touches after the FIRST purchase (including a same-timestamp tie
    and pre-second-purchase touches) earn nothing; repeated pre-touch
    types count once (floor split across distinct types)."""
    rows = [
        (1, _ts(0), 1, "view"),
        (2, _ts(0), 1, "view"),       # duplicate type, still one touch
        (3, _ts(1), 1, "signup"),
        (4, _ts(2), 1, "click"),
        (5, _ts(3), 1, "purchase"),   # first conversion
        (6, _ts(3), 1, "error"),      # tie with conv ts -> excluded
        (7, _ts(4), 1, "click"),      # after -> excluded
        (8, _ts(5), 1, "purchase"),   # second conversion ignored
    ]
    got = {
        r.channel: (r.n_conversions, r.micro_credits)
        for r in linear_attribution(_ev(spark, rows)).collect()
    }
    third = 1_000_000 // 3  # 333333, floor — remainder dropped
    assert got == {
        "view": (1, third),
        "signup": (1, third),
        "click": (1, third),
    }


# -------------------------------------------------------- quantile_normalize


from yellowrush_spark_ml_pipeline_spark.operators.cleaning import (  # noqa: E402
    quantile_normalize,
)


def test_quantile_normalize_exact_percentiles_per_group(spark):
    """5-row group maps to {0, .25, .5, .75, 1}; scale differences
    between groups vanish; a global cutoff then selects the same
    fraction from each group."""
    rows = [
        (1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "a", 40), (5, "a", 50),
        (6, "b", 1000), (7, "b", 2000), (8, "b", 3000),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {
        r.doc_id: r.pct
        for r in quantile_normalize(df, "n_chars", "source", "doc_id").collect()
    }
    assert got == {1: 0.0, 2: 0.25, 3: 0.5, 4: 0.75, 5: 1.0, 6: 0.0, 7: 0.5, 8: 1.0}


def test_quantile_normalize_ties_break_by_id_and_singleton_is_half(spark):
    rows = [(1, "a", 7), (2, "a", 7), (3, "b", 99)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {
        r.doc_id: r.pct
        for r in quantile_normalize(df, "n_chars", "source", "doc_id").collect()
    }
    assert got == {1: 0.0, 2: 1.0, 3: 0.5}


# ------------------------------------------------------- mad_outlier_summary


from yellowrush_spark_ml_pipeline_spark.operators.aggregates import (  # noqa: E402
    mad_outlier_summary,
)


def test_mad_flags_planted_outlier_zscore_would_miss_none(spark):
    """Group of 11 tight values + one wild outlier: discrete median 100;
    sorted devs [0,0,0,1,1,1,1,2,2,2,3,9900] -> disc-median MAD = 1;
    only the 10_000 value exceeds 3 MADs."""
    vals = [98, 99, 99, 100, 100, 100, 101, 101, 102, 102, 103, 10_000]
    rows = [("a", v) for v in vals]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = mad_outlier_summary(df, "grp", "v", k_tenths=30).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_total == 12 and r.median_v == 100 and r.mad == 1
    # |dev| > 3*1=3 -> only 10_000 qualifies (dev 9900)
    assert r.n_outliers == 1


def test_mad_outliers_robust_to_the_outlier_itself(spark):
    """The 10_000 value must NOT drag the median/MAD (the z-score
    failure mode): removing it leaves median and MAD unchanged."""
    vals = [98, 99, 99, 100, 100, 100, 101, 101, 102, 102, 103]
    df_clean = spark.createDataFrame([("a", v) for v in vals], "grp string, v long")
    r = mad_outlier_summary(df_clean, "grp", "v", k_tenths=30).collect()[0]
    assert r.median_v == 100 and r.mad == 1 and r.n_outliers == 0


def test_mad_integer_threshold_boundary(spark):
    """dev == 3*mad exactly is NOT an outlier (strict >): with mad=2,
    dev=6 stays in, dev=7 is out."""
    vals = [100, 100, 100, 98, 102, 94, 106, 107, 96, 104]
    # sorted devs [0,0,0,2,2,4,4,6,6,7]: disc-median mad=2, threshold 6
    df = spark.createDataFrame([("a", v) for v in vals], "grp string, v long")
    r = mad_outlier_summary(df, "grp", "v", k_tenths=30).collect()[0]
    assert r.median_v == 100 and r.mad == 2
    assert r.n_outliers == 1  # only dev=7 exceeds 6; the two dev=6 stay in


# ---------------------------------------------------------- ab_welch_summary


from yellowrush_spark_ml_pipeline_spark.operators.aggregates import (  # noqa: E402
    ab_welch_summary,
)


def test_ab_welch_matches_scipy_free_reference(spark):
    """Hand-computable planted experiment vs a pure-Python Welch
    reference (no scipy in container): unit-level totals, parity
    arms."""
    import math

    rows = []
    # arm 0 (even users): totals 10, 12, 14 ; arm 1 (odd): 20, 22, 24
    for u, tot in [(2, 10.0), (4, 12.0), (6, 14.0), (1, 20.0), (3, 22.0), (5, 24.0)]:
        rows.append((u, tot / 2))
        rows.append((u, tot / 2))  # two events per user summing to tot
    df = spark.createDataFrame(rows, "user_id long, value double")
    r = ab_welch_summary(df, "user_id", "value").collect()[0]

    a, b = [10.0, 12.0, 14.0], [20.0, 22.0, 24.0]
    ma, mb = sum(a) / 3, sum(b) / 3
    va = sum((x - ma) ** 2 for x in a) / 2
    vb = sum((x - mb) ** 2 for x in b) / 2
    t = (ma - mb) / math.sqrt(va / 3 + vb / 3)
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.mean_a == round(ma, 6) and r.mean_b == round(mb, 6)
    assert r.var_a == round(va, 6) and r.var_b == round(vb, 6)
    assert abs(r.welch_t - t) < 1e-6
    assert r.welch_t < -3  # planted separation is significant and negative


def test_ab_welch_unit_level_not_row_level(spark):
    """100 events for ONE user must count as n=1 unit, not 100 samples —
    the correlated-events trap the operator exists to avoid."""
    rows = [(2, 1.0)] * 100 + [(4, 3.0), (1, 2.0), (3, 2.5)]
    df = spark.createDataFrame(rows, "user_id long, value double")
    r = ab_welch_summary(df, "user_id", "value").collect()[0]
    assert r.n_a == 2  # users 2 (total 100) and 4 (total 3)
    assert r.n_b == 2  # users 1, 3
    assert r.mean_a == round((100.0 + 3.0) / 2, 6)


# ------------------------------------------------------------------ dq_report


from yellowrush_spark_ml_pipeline_spark.operators.aggregates import (  # noqa: E402
    dq_report,
    fk_orphans,
    pk_duplicates,
)


def test_dq_report_planted_violations(spark):
    """Duplicated PK, two orphan children, one range breach — each check
    reports its exact violation count; clean checks report 0."""
    parent = spark.createDataFrame([(1,), (2,), (2,), (3,)], "pk long")
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (99, 30), (98, 40)], "fk long, qty long"
    )
    checks = {
        "parent_pk_unique": pk_duplicates(parent, "pk"),
        "child_fk_orphans": fk_orphans(child, parent, "fk", "pk"),
        "child_qty_range": child.agg(
            __import__("pyspark.sql.functions", fromlist=["x"]).sum(
                (child["qty"] > 25).cast("int")
            ).alias("violations")
        ),
    }
    got = {r.check: r.violations for r in dq_report(checks).collect()}
    assert got == {
        "parent_pk_unique": 1,   # pk=2 twice -> 4 rows - 3 distinct
        "child_fk_orphans": 2,   # fk 99, 98
        "child_qty_range": 2,    # 30, 40
    }


def test_dq_report_requires_checks(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dq_report({})


def test_dq_column_checks_fused_single_scan(spark):
    """Same-table constraints fused via dq_column_checks report the same
    violation counts as their standalone forms, feed cleanly through
    dq_report, and plan exactly ONE exchange — the whole point is a
    single pass over the fact table."""
    from pyspark.sql import functions as F

    from yellowrush_spark_ml_pipeline_spark.operators.aggregates import (
        dq_column_checks,
        pk_duplicates_expr,
    )

    t = spark.createDataFrame(
        [(1, 5), (2, 70), (2, 10), (3, -1)], "pk long, qty long"
    )
    fused = dq_column_checks(
        t,
        {
            "t_pk_unique": pk_duplicates_expr("pk"),
            "t_qty_range": F.sum(
                ((t["qty"] <= 0) | (t["qty"] > 60)).cast("long")
            ),
        },
    )
    got = {r.check: r.violations for r in dq_report({"t": fused}).collect()}
    assert got == {"t_pk_unique": 1, "t_qty_range": 2}
    plan = fused._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # drop the AQE pre-plan copy
    n_scans = final.count("Scan ")
    # count_distinct legitimately needs its two-phase exchange; the fusion
    # win is the SINGLE table pass feeding every constraint.
    n_exchanges = final.count("Exchange")
    assert n_scans == 1, f"fused checks should share one scan:\n{final}"
    assert n_exchanges <= 2, f"expected <=2 exchanges (distinct 2-phase):\n{final}"
