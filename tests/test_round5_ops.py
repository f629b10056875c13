"""Direct semantic tests for the round-5 operators — hand-computed
known answers and planted behaviors the registry oracle can't pin (the
oracle proves Spark==DuckDB; these prove both equal the MATH)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from yellowrush_spark_ml_pipeline_spark.operators import (
    aggregates,
    dedup,
    mutations,
    textstats,
    timeseries,
)


def test_cdc_diff_all_op_classes_and_null_safety(spark):
    old = spark.createDataFrame(
        [
            Row(k=1, a="x", b=10.0),   # unchanged
            Row(k=2, a="x", b=10.0),   # update: b changes
            Row(k=3, a="x", b=10.0),   # delete
            Row(k=4, a=None, b=10.0),  # update: NULL -> value (null-safe)
            Row(k=5, a="x", b=None),   # update: value -> NULL + b NULL->value
        ]
    )
    new = spark.createDataFrame(
        [
            Row(k=1, a="x", b=10.0),
            Row(k=2, a="x", b=11.0),
            Row(k=4, a="y", b=10.0),
            Row(k=5, a=None, b=3.0),
            Row(k=6, a="z", b=1.0),    # insert
        ]
    )
    out = {
        r["k"]: (r["op"], r["changed_cols"])
        for r in mutations.cdc_diff(old, new, "k", ["a", "b"]).collect()
    }
    assert out[1] == ("unchanged", "")
    assert out[2] == ("update", "b")
    assert out[3] == ("delete", "")
    assert out[4] == ("update", "a")
    assert out[5] == ("update", "a,b")
    assert out[6] == ("insert", "")


def test_ols_fit_exact_line_and_negative_slope(spark):
    rows = [Row(g="up", x=i, y=2 * i + 3) for i in range(10)] + [
        Row(g="down", x=i, y=-2 * i + 10) for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["g"]: (r["slope_e6"], r["intercept_e6"])
        for r in aggregates.ols_fit(
            df, "g", F.col("x"), F.col("y").cast("bigint")
        ).collect()
    }
    assert got["up"] == (2_000_000, 3_000_000)
    assert got["down"] == (-2_000_000, 10_000_000)


def test_time_weighted_avg_hand_computed(spark):
    # v=1.00 held 10 s, v=3.00 held 20 s -> TWA = (100*10+300*20)/30 cents
    # = 233.33.. -> 2_333_333 in value-micro units (floor).
    df = spark.createDataFrame(
        [
            Row(event_id=1, event_type="a", ts="2024-01-01 00:00:00", value=1.0),
            Row(event_id=2, event_type="a", ts="2024-01-01 00:00:10", value=3.0),
            Row(event_id=3, event_type="a", ts="2024-01-01 00:00:30", value=9.9),
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    [r] = timeseries.time_weighted_avg(df).collect()
    assert r["n_intervals"] == 2
    assert r["total_dur_us"] == 30_000_000
    assert r["twa_e6"] == 2_333_333


def test_autocorrelation_perfect_alternation(spark):
    # Hourly counts 1,3,1,3,... -> lag-1 r = -1 exactly, lag-2 r = +1.
    rows = []
    eid = 0
    for h in range(8):
        cnt = 1 if h % 2 == 0 else 3
        for i in range(cnt):
            eid += 1
            rows.append(
                Row(event_id=eid, ts=f"2024-01-01 {h:02d}:{i:02d}:00")
            )
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        r["lag"]: r["signed_r2_e6"]
        for r in timeseries.autocorrelation(df, max_lag=2).collect()
    }
    assert out[1] == -1_000_000
    assert out[2] == 1_000_000


def test_lttb_keeps_endpoints_members_and_spike(spark):
    # 200-point series, flat y=10 except a spike at x=137: LTTB must keep
    # both endpoints, return exactly n_out member points, and select the
    # spike (largest triangle in its bucket by construction).
    rows = [Row(x=i, y=(1000 if i == 137 else 10)) for i in range(200)]
    series = spark.createDataFrame(rows)
    out = timeseries.lttb_downsample(series, n_out=20).collect()
    xs = [r["x"] for r in out]
    assert len(out) == 20
    assert xs == sorted(xs)
    assert xs[0] == 0 and xs[-1] == 199
    assert 137 in xs
    src = {(r["x"], r["y"]) for r in rows}
    assert all((r["x"], r["y"]) in src for r in out)


def test_segment_line_dedup_strikes_frequent_segments_only(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"  # one 8-word seg
    uniq = "iota kappa lambda mu nu xi omicron pi"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=base),
            Row(doc_id=3, text=base),            # freq 3 -> struck everywhere
            Row(doc_id=4, text=uniq + " " + base),  # uniq survives, base struck
            Row(doc_id=5, text=uniq),            # oops: uniq now freq 2 - kept
        ]
    )
    out = {
        r["doc_id"]: r
        for r in dedup.segment_line_dedup(df, seg_words=8, max_freq=2).collect()
    }
    for d in (1, 2, 3):
        assert out[d]["n_kept"] == 0 and out[d]["new_text"] == ""
    assert out[4]["n_segs"] == 2 and out[4]["n_kept"] == 1
    assert out[4]["new_text"] == uniq
    assert out[5]["new_text"] == uniq


def test_segment_line_dedup_drops_zero_token_docs(spark):
    """Empty/punctuation-only docs tokenize to zero segments; Spark's
    sequence(0, -1) would DESCEND to [0, -1] and fabricate two phantom
    empty segments (one output row) the DuckDB oracle's range(0) never
    emits — ADVICE r5. The guard must drop such docs entirely."""
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=""),
            Row(doc_id=2, text="?!., --"),
            Row(doc_id=3, text="alpha beta gamma delta epsilon zeta eta theta"),
        ]
    )
    out = {
        r["doc_id"]: r
        for r in dedup.segment_line_dedup(df, seg_words=8, max_freq=2).collect()
    }
    assert set(out) == {3}
    assert out[3]["n_segs"] == 1 and out[3]["n_kept"] == 1


def test_quality_funnel_counts_are_monotone(spark, sf_dir="/root/testdata/sf0.001"):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for r in textstats.quality_funnel(docs).collect():
        seq = [
            r["n_docs"],
            r["n_len_ok"],
            r["n_words_ok"],
            r["n_wordlen_ok"],
            r["n_stopword_ok"],
        ]
        assert all(a >= b for a, b in zip(seq, seq[1:])), seq


def test_readability_hand_computed(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="hello world")])
    [r] = textstats.readability(df).collect()
    assert r["n_words"] == 2
    assert r["n_syllables"] == 3  # he-llo: e,o ; world: o
    assert r["syl_per_word_milli"] == 1500
    assert r["fk_grade_milli"] == 390 * 2 + (11800 * 3) // 2 - 15590


def test_gini_hand_computed(spark):
    df = spark.createDataFrame(
        [Row(k=1, c=0), Row(k=2, c=0), Row(k=3, c=10)]
    )
    [r] = aggregates.gini_coefficient(df, "k", F.col("c")).collect()
    assert r["n_keys"] == 3 and r["total_cents"] == 10
    assert r["gini_e6"] == 666_666  # true Gini of [0,0,10] = 2/3
    eq = spark.createDataFrame([Row(k=i, c=5) for i in range(4)])
    [r2] = aggregates.gini_coefficient(eq, "k", F.col("c")).collect()
    assert r2["gini_e6"] == 0


def test_chi_square_perfect_independence(spark):
    rows = [
        Row(r=r, c=c) for r in ("A", "B") for c in ("X", "Y")
        for _ in range(10)
    ]
    out = aggregates.chi_square_independence(
        spark.createDataFrame(rows), "r", "c"
    ).collect()
    assert len(out) == 4
    for row in out:
        assert row["observed"] == 10
        assert row["expected_milli"] == 10_000
        assert row["contrib_e6"] == 0


def test_benford_digit_shares(spark):
    df = spark.createDataFrame(
        [Row(v=100), Row(v=1900), Row(v=2500), Row(v=900)]
    )
    out = {r["digit"]: r for r in aggregates.benford_digits(df, F.col("v")).collect()}
    assert out[1]["n"] == 2 and out[1]["share_e6"] == 500_000
    assert out[2]["n"] == 1 and out[2]["share_e6"] == 250_000
    assert out[9]["n"] == 1
    assert out[1]["benford_e6"] == 301_030


def test_association_rules_hand_computed(spark):
    from yellowrush_spark_ml_pipeline_spark.operators import events as ev_ops

    rows = [
        # basket (u=1, day 1): {a, b};  (u=2, day 1): {a, b};  (u=3): {a}
        Row(user_id=1, ts="2024-01-01 00:00:00", event_type="a"),
        Row(user_id=1, ts="2024-01-01 01:00:00", event_type="b"),
        Row(user_id=2, ts="2024-01-01 00:00:00", event_type="a"),
        Row(user_id=2, ts="2024-01-01 01:00:00", event_type="b"),
        Row(user_id=3, ts="2024-01-01 00:00:00", event_type="a"),
    ]
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in ev_ops.association_rules(df).collect()
    }
    ab = out[("a", "b")]
    assert ab["n_ab"] == 2
    assert ab["support_e6"] == 666_666
    assert ab["confidence_e6"] == 666_666  # 2 of 3 a-baskets contain b
    assert ab["lift_e6"] == 1_000_000     # 2*3 / (3*2)
    ba = out[("b", "a")]
    assert ba["confidence_e6"] == 1_000_000  # every b-basket contains a


def test_psi_zero_on_identical_distributions(spark):
    from yellowrush_spark_ml_pipeline_spark.operators import events as ev_ops

    rows = []
    eid = 0
    for half_day in ("2024-01-10", "2024-01-20"):
        for v, n in ((10.0, 4), (60.0, 6), (120.0, 2)):
            for _ in range(n):
                eid += 1
                rows.append(Row(event_id=eid, ts=f"{half_day} 00:00:00", value=v))
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = ev_ops.psi_drift(df).collect()
    assert len(out) == 3
    assert all(r["psi_term_nano"] == 0 for r in out)


def test_theil_sen_exact_line(spark):
    series = spark.createDataFrame([Row(x=i, y=3 * i) for i in range(10)])
    [r] = timeseries.theil_sen(series).collect()
    assert r["n_pairs"] == 45
    assert (
        r["q1_slope_e9"]
        == r["median_slope_e9"]
        == r["q3_slope_e9"]
        == 3_000_000_000
    )


def test_mann_whitney_separation_and_ties(spark):
    sep = spark.createDataFrame(
        [Row(g="A", v=1), Row(g="A", v=2), Row(g="B", v=3), Row(g="B", v=4)]
    )
    [r] = aggregates.mann_whitney_u(sep, "g", "A", "B", F.col("v")).collect()
    assert (r["n_a"], r["n_b"], r["u2_a"], r["u2_b"], r["mu2_u"]) == (
        2, 2, 0, 8, 4,
    )
    tied = spark.createDataFrame(
        [Row(g="A", v=1), Row(g="A", v=2), Row(g="B", v=2), Row(g="B", v=3)]
    )
    [t] = aggregates.mann_whitney_u(tied, "g", "A", "B", F.col("v")).collect()
    assert t["u2_a"] == 1  # U_a = 0.5 with the tie at v=2


def test_column_entropy_degenerate_and_uniform(spark):
    df = spark.createDataFrame(
        [Row(const="k", fair=("x" if i % 2 == 0 else "y")) for i in range(8)]
    )
    out = {
        r["col"]: r for r in aggregates.column_entropy(df, ["const", "fair"]).collect()
    }
    assert out["const"]["n_distinct"] == 1
    assert out["const"]["entropy_nano"] == 0
    assert out["fair"]["n_distinct"] == 2
    assert out["fair"]["entropy_nano"] == 693_147_181  # round(ln2 * 1e9)


def test_kaplan_meier_hand_computed(spark):
    from yellowrush_spark_ml_pipeline_spark.operators import events as ev_ops

    # Four subjects: convert at t=1h (two), t=2h (one); one never
    # converts (censored at corpus end, 3h after signup). Also one user
    # whose only purchase PRECEDES signup: must appear as censored, not
    # vanish (the left-join predicate regression).
    rows = [
        Row(user_id=1, event_type="signup", ts="2024-01-01 00:00:00"),
        Row(user_id=1, event_type="purchase", ts="2024-01-01 01:00:00"),
        Row(user_id=2, event_type="signup", ts="2024-01-01 00:00:00"),
        Row(user_id=2, event_type="purchase", ts="2024-01-01 01:30:00"),
        Row(user_id=3, event_type="signup", ts="2024-01-01 00:00:00"),
        Row(user_id=3, event_type="purchase", ts="2024-01-01 02:00:00"),
        Row(user_id=4, event_type="signup", ts="2024-01-01 00:00:00"),
        Row(user_id=5, event_type="purchase", ts="2024-01-01 00:30:00"),
        Row(user_id=5, event_type="signup", ts="2024-01-01 01:00:00"),
        Row(user_id=9, event_type="view", ts="2024-01-01 03:00:00"),
    ]
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {r["t"]: r for r in ev_ops.kaplan_meier(df).collect()}
    # t=1h: users 1,2 convert; risk set = all 5 subjects.
    assert out[1]["n_risk"] == 5 and out[1]["n_events"] == 2
    # t=2h: user 3 converts; users 4,5 still at risk (censored at 3h/2h).
    assert out[2]["n_risk"] == 3 and out[2]["n_events"] == 1
    import math

    s1 = round(math.log(3 / 5) * 1e9)
    assert out[1]["log_surv_nano"] == s1
    assert out[2]["log_surv_nano"] == s1 + round(math.log(2 / 3) * 1e9)
    assert out[1]["surv_e6"] == 600_000


def test_seasonal_naive_backtest_perfect_seasonality(spark):
    # Counts repeat with period 24 exactly -> seasonal-naive error 0,
    # naive error > 0.
    rows = []
    eid = 0
    for day in range(3):
        for h in range(24):
            cnt = 1 + (h % 4)
            for i in range(cnt):
                eid += 1
                rows.append(
                    Row(event_id=eid, ts=f"2024-01-{day+1:02d} {h:02d}:{i:02d}:00")
                )
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {r["model"]: r for r in timeseries.seasonal_naive_backtest(df).collect()}
    assert out["seasonal_naive"]["sum_abs_err"] == 0
    assert out["seasonal_naive"]["smape_e6"] == 0
    assert out["naive"]["sum_abs_err"] > 0
    assert out["naive"]["n_points"] == 71
    assert out["seasonal_naive"]["n_points"] == 48


def test_rfm_segments_partition_users_once(spark):
    from yellowrush_spark_ml_pipeline_spark.operators import events as ev_ops

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = ev_ops.rfm_segments(ev).collect()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_users"] for r in out) == n_users
    for r in out:
        for c in ("r_score", "f_score", "m_score"):
            assert 1 <= r[c] <= 5


def test_cdc_diff_reconstructs_new_snapshot(spark):
    """Apply-property: old + diff must reconstruct new exactly —
    (inserts ∪ updates ∪ unchanged) with new-side values equals the new
    snapshot, and deletes equal old∖new keys. Proves the diff is a
    lossless changeset, not just a classification."""
    old = spark.createDataFrame(
        [Row(k=i, a=f"v{i % 3}", b=float(i)) for i in range(50)]
    )
    new = spark.createDataFrame(
        [
            Row(k=i, a=f"v{(i + (1 if i % 7 == 0 else 0)) % 3}",
                b=float(i) + (10.0 if i % 5 == 0 else 0.0))
            for i in range(50) if i % 11 != 0
        ]
        + [Row(k=100 + i, a="new", b=1.0) for i in range(5)]
    )
    diff = mutations.cdc_diff(old, new, "k", ["a", "b"])
    rebuilt = sorted(
        (r["k"], r["new_a"], r["new_b"])
        for r in diff.filter(F.col("op") != "delete").collect()
    )
    want = sorted((r["k"], r["a"], r["b"]) for r in new.collect())
    assert rebuilt == want
    deleted = sorted(r["k"] for r in diff.filter(F.col("op") == "delete").collect())
    assert deleted == [i for i in range(50) if i % 11 == 0]


def test_ols_fit_survives_bigint_overflow_range(spark):
    """Row products near 2^63 must not wrap: x·y ≈ 4.6e18 per row here,
    so a BIGINT accumulation corrupts silently — the DECIMAL(38,0) path
    keeps the exact-line slope exact."""
    big = 2**31  # x*y per row ~ 2^62, sum of 10 rows overflows int64
    rows = [Row(g="up", x=i * big, y=(2 * i * big + 7)) for i in range(1, 11)]
    [r] = aggregates.ols_fit(
        spark.createDataFrame(rows), "g", F.col("x"), F.col("y").cast("bigint")
    ).collect()
    assert r["slope_e6"] == 2_000_000
    assert r["intercept_e6"] == 7_000_000


def test_ohlc_hand_computed(spark):
    df = spark.createDataFrame(
        [
            Row(event_id=1, ts="2024-01-01 00:05:00", value=2.00),
            Row(event_id=2, ts="2024-01-01 00:10:00", value=9.00),
            Row(event_id=3, ts="2024-01-01 00:20:00", value=1.00),
            Row(event_id=4, ts="2024-01-01 00:50:00", value=5.00),
            Row(event_id=5, ts="2024-01-01 01:10:00", value=7.00),
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["bucket"]: r for r in timeseries.ohlc_bars(df).collect()}
    h0 = out[min(out)]
    assert (h0["open"], h0["high"], h0["low"], h0["close"], h0["volume"]) == (
        200, 900, 100, 500, 4,
    )
    h1 = out[max(out)]
    assert (h1["open"], h1["close"], h1["volume"]) == (700, 700, 1)


def test_cusum_finds_planted_level_shift(spark):
    # 20 hours at 2 events, then 20 hours at 8: CUSUM |S| peaks exactly
    # at the last pre-shift bucket.
    rows = []
    eid = 0
    for h in range(40):
        for i in range(2 if h < 20 else 8):
            eid += 1
            rows.append(
                Row(event_id=eid, ts=f"2024-01-0{1 + h // 24}"
                    f" {h % 24:02d}:{i:02d}:00")
            )
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    [r] = timeseries.cusum_changepoint(df).collect()
    buckets = sorted(
        x["bucket"]
        for x in df.select(
            F.floor(F.unix_timestamp("ts") / 3600).alias("bucket")
        ).distinct().collect()
    )
    assert r["changepoint_bucket"] == buckets[19]
    assert r["s2_signed"] == -r["max_abs_s2"]  # mass below mean pre-shift


def test_burst_runs_merge_contiguous_hours(spark):
    from yellowrush_spark_ml_pipeline_spark.operators import events as ev_ops

    # 40 quiet hours (1 event) + hours 10,11,12 and 30 busy (9 events):
    # top-10% = 4 hours -> runs [10..12] and [30].
    rows = []
    eid = 0
    for h in range(40):
        n = 9 if h in (10, 11, 12, 30) else 1
        for i in range(n):
            eid += 1
            rows.append(
                Row(event_id=eid, ts=f"2024-01-0{1 + h // 24}"
                    f" {h % 24:02d}:{i:02d}:00")
            )
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = ev_ops.burst_runs(df, top_permille=100).collect()
    assert len(out) == 2
    assert (out[0]["n_hours"], out[0]["peak_cnt"], out[0]["total_cnt"]) == (3, 9, 27)
    assert (out[1]["n_hours"], out[1]["total_cnt"]) == (1, 9)
