"""Direct semantic tests for the round-6 operators — hand-computed
known answers and planted behaviors the registry oracle can't pin (the
oracle proves Spark==DuckDB; these prove both equal the MATH)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from yellowrush_spark_ml_pipeline_spark.operators import (
    aggregates,
    layout,
    sketches,
    timeseries,
)


def _md5_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_hll_registers_match_python_reference(spark):
    """Register index / payload / rho reproduce a pure-Python md5 HLL —
    pins the hash contract independently of both engines."""
    vals = [str(i) for i in range(200)]
    df = spark.createDataFrame([Row(g="a", v=v) for v in vals])
    got = {
        r["register"]: r["max_rho"]
        for r in sketches.hll_registers(df, ["g"], "v").collect()
    }
    want: dict[int, int] = {}
    for v in vals:
        h = _md5_hash60(v)
        reg, w = h % sketches.HLL_M, h // sketches.HLL_M
        if w == 0:
            rho = 53
        else:
            rho = (w & -w).bit_length()  # trailing zeros + 1
        want[reg] = max(want.get(reg, 0), rho)
    assert got == want


def test_hll_estimate_within_band_and_linear_branch(spark):
    """n=2000 distinct -> raw estimator within 4 sigma (~26% for m=256);
    n=100 -> linear-counting branch, which is typically within ~2%."""
    big = spark.createDataFrame([Row(g="big", v=str(i)) for i in range(2000)])
    small = spark.createDataFrame(
        [Row(g="small", v=str(i)) for i in range(100)]
    )
    out = {
        r["g"]: r
        for r in sketches.hll_distinct(
            big.unionByName(small), ["g"], "v"
        ).collect()
    }
    est_big = out["big"]["hll_est_milli"] / 1000.0
    assert abs(est_big - 2000) / 2000 < 0.26
    est_small = out["small"]["hll_est_milli"] / 1000.0
    assert out["small"]["n_nonzero"] < sketches.HLL_M  # linear branch armed
    assert abs(est_small - 100) / 100 < 0.10
    assert out["big"]["exact_distinct"] == 2000


def test_hll_registers_merge_across_unions(spark):
    """Sketch mergeability: registers(A union B) == re-max of
    registers(A) union registers(B)."""
    a = spark.createDataFrame([Row(g="x", v=str(i)) for i in range(300)])
    b = spark.createDataFrame(
        [Row(g="x", v=str(i)) for i in range(150, 450)]
    )
    direct = {
        (r["register"],): r["max_rho"]
        for r in sketches.hll_registers(
            a.unionByName(b), ["g"], "v"
        ).collect()
    }
    merged_df = (
        sketches.hll_registers(a, ["g"], "v")
        .unionByName(sketches.hll_registers(b, ["g"], "v"))
        .groupBy("g", "register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    merged = {(r["register"],): r["max_rho"] for r in merged_df.collect()}
    assert direct == merged


def test_bitmap_activity_hand_computed(spark):
    rows = [
        # entity 0: days 0, 2, 2 (dup), 5 -> 3 active days
        Row(user_id=0, ts="2024-01-01 10:00:00"),
        Row(user_id=0, ts="2024-01-03 10:00:00"),
        Row(user_id=0, ts="2024-01-03 23:00:00"),
        Row(user_id=0, ts="2024-01-06 01:00:00"),
        # entity 1: day 0 only
        Row(user_id=1, ts="2024-01-01 09:00:00"),
        # entity 3 (same cohort as 1 with mod 2): day 70 -> filtered out
        Row(user_id=3, ts="2024-03-15 09:00:00"),
        # entity 2: days 0..3 -> 4 active days
        *[Row(user_id=2, ts=f"2024-01-0{d} 12:00:00") for d in (1, 2, 3, 4)],
    ]
    df = spark.createDataFrame(rows).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {
        r["cohort"]: r
        for r in sketches.bitmap_activity(
            df, "user_id", "ts", "2024-01-01", cohort_mod=2
        ).collect()
    }
    assert out[0]["n_entities"] == 2  # users 0 and 2
    assert out[0]["total_active_days"] == 7  # 3 + 4
    assert out[0]["max_active_days"] == 4
    assert out[0]["n_patterns"] == 2
    assert out[1]["n_entities"] == 1  # user 1 only; user 3 out of window
    assert out[1]["total_active_days"] == 1


def test_salted_aggregate_equals_plain_groupby(spark):
    df = spark.createDataFrame(
        [Row(k="hot", i=i, x=i % 7) for i in range(1000)]
        + [Row(k="cold", i=i, x=1) for i in range(10)]
    )
    got = {
        r["k"]: (r["n_rows"], r["x_sum"])
        for r in aggregates.salted_aggregate(
            df, "k", F.col("i"), 16, {"x_sum": F.sum("x")}
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
        .collect()
    }
    assert got == want


def test_salted_aggregate_plan_has_two_stage_shape(spark):
    """The salted rewrite must actually produce two aggregation stages
    keyed differently (key+salt, then key) — not collapse back into one."""
    df = spark.createDataFrame([Row(k="a", i=i, x=1) for i in range(100)])
    plan = (
        aggregates.salted_aggregate(
            df, "k", F.col("i"), 8, {"x_sum": F.sum("x")}
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.lower().count("hashaggregate") >= 4  # 2 stages x partial+final


def test_zone_maps_and_prune_summary(spark):
    rows = [
        Row(eid=i, ts=f"2024-01-{(i // 4) + 1:02d} 00:00:00", u=i % 3)
        for i in range(16)
    ]
    df = spark.createDataFrame(rows).select(
        F.col("eid"), F.col("ts").cast("timestamp").alias("ts"), F.col("u")
    )
    zones = layout.zone_map_stats(df, "eid", 4, "ts", "u")
    z = {r["bucket"]: r for r in zones.collect()}
    assert set(z) == {0, 1, 2, 3}
    assert all(z[b]["n_rows"] == 4 and z[b]["ndv"] == 3 for b in z)
    assert z[0]["zone_width_days"] == 0  # 4 rows, same day each bucket
    s = layout.zone_prune_summary(zones, "2024-01-03").collect()[0]
    assert s["n_zones"] == 4
    assert s["n_prunable"] == 2  # buckets 0 (Jan 1) and 1 (Jan 2)
    assert s["rows_skipped"] == 8 and s["rows_total"] == 16


def test_range_window_differs_from_rows_at_gaps(spark):
    """A 2-hour gap must break the trailing-3h range frame — the exact
    case where RANGE and ROWS frames disagree."""
    rows = [
        Row(g="a", ts="2024-01-01 00:30:00", v=1.0),
        Row(g="a", ts="2024-01-01 01:30:00", v=2.0),
        # gap: no 02:xx or 03:xx events
        Row(g="a", ts="2024-01-01 04:30:00", v=4.0),
    ]
    df = spark.createDataFrame(rows).select(
        "g", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = {
        r["bucket_epoch"]: r
        for r in timeseries.range_window_stats(
            df, "g", "ts", "v", 3600, 10800
        ).collect()
    }
    epochs = sorted(out)
    # hour 1 sees hour 0 (within 3h)
    assert out[epochs[1]]["n_trailing"] == 2
    # hour 4: hour 1 is exactly -3h -> INCLUDED by RANGE (closed bound),
    # hour 0 (-4h) is not; a 3-row ROWS frame would have counted all 3
    assert out[epochs[2]]["n_trailing"] == 2
    assert out[epochs[2]]["cents_trailing"] == 600


def test_hash_split_is_group_pure_and_deterministic(spark):
    from yellowrush_spark_ml_pipeline_spark.operators import cleaning

    df = spark.createDataFrame(
        [Row(g=f"grp{i % 13}", i=i) for i in range(260)]
    )
    out = cleaning.hash_split(df, "g")
    # group purity: each group maps to exactly one split
    per_group = (
        out.groupBy("g")
        .agg(F.countDistinct("split").alias("k"))
        .collect()
    )
    assert all(r["k"] == 1 for r in per_group)
    # stability: recomputing on a superset never moves an old group
    bigger = spark.createDataFrame(
        [Row(g=f"grp{i % 29}", i=i) for i in range(580)]
    )
    first = {
        r["g"]: r["split"]
        for r in cleaning.hash_split(df, "g").select("g", "split")
        .distinct().collect()
    }
    second = {
        r["g"]: r["split"]
        for r in cleaning.hash_split(bigger, "g").select("g", "split")
        .distinct().collect()
    }
    assert all(second[g] == s for g, s in first.items())


def test_target_encoding_leave_fold_out_math(spark):
    from yellowrush_spark_ml_pipeline_spark.operators import features

    # one category, ids chosen across folds; verify enc for each fold
    rows = [Row(c="A", i=i, y=(i % 3 == 0)) for i in range(60)]
    df = spark.createDataFrame(rows)
    out = {
        r["fold"]: r
        for r in features.target_encoding(
            df, "c", "i", F.col("y").cast("int"), k_folds=5
        ).collect()
    }
    folds: dict[int, tuple[int, int]] = {}
    for r in rows:
        f = _md5_hash60(str(r.i)) % 5
        n, s = folds.get(f, (0, 0))
        folds[f] = (n + 1, s + int(r.y))
    n_all = sum(n for n, _ in folds.values())
    s_all = sum(s for _, s in folds.values())
    for f, (n, s) in folds.items():
        want = (1000 * (s_all - s)) // (n_all - n)
        assert out[f]["enc_milli"] == want
        assert out[f]["n_fold"] == n


def test_target_encoding_single_fold_category_is_null(spark):
    from yellowrush_spark_ml_pipeline_spark.operators import features

    # a category whose only rows share one fold -> no other-fold data
    one_id = 7
    df = spark.createDataFrame(
        [Row(c="only", i=one_id, y=1), Row(c="only", i=one_id, y=0)]
    )
    out = features.target_encoding(
        df, "c", "i", F.col("y"), k_folds=5
    ).collect()
    assert len(out) == 1 and out[0]["enc_milli"] is None


def test_woe_iv_hand_computed(spark):
    from yellowrush_spark_ml_pipeline_spark.operators import features

    # bucket 0: 30 pos / 10 neg; bucket 1: 10 pos / 30 neg;
    # bucket 2: 5 pos / 0 neg (one-sided -> NULL woe/iv)
    rows = (
        [Row(b=0, y=True)] * 30 + [Row(b=0, y=False)] * 10
        + [Row(b=1, y=True)] * 10 + [Row(b=1, y=False)] * 30
        + [Row(b=2, y=True)] * 5
    )
    df = spark.createDataFrame(rows)
    out = {
        r["bucket"]: r
        for r in features.woe_iv(df, "b", F.col("y")).collect()
    }
    t_pos, t_neg = 45, 40
    for b, (np_, nn) in {0: (30, 10), 1: (10, 30)}.items():
        woe = round(math.log((np_ * t_neg) / (nn * t_pos)) * 1e9)
        assert out[b]["woe_nano"] == woe
        iv = ((np_ * t_neg - nn * t_pos) * woe) // (t_pos * t_neg)
        assert out[b]["iv_term_nano"] == iv
        assert out[b]["iv_term_nano"] >= 0
    assert out[2]["woe_nano"] is None and out[2]["iv_term_nano"] is None


def test_cohens_kappa_known_values_including_negative(spark):
    # perfect agreement -> 1000
    perfect = spark.createDataFrame(
        [Row(a=True, b=True)] * 6 + [Row(a=False, b=False)] * 4
    )
    r = aggregates.cohens_kappa(
        perfect, F.col("a"), F.col("b")
    ).collect()[0]
    assert r["kappa_milli"] == 1000
    # systematic disagreement -> negative kappa; pins the sign-split div
    anti = spark.createDataFrame(
        [Row(a=True, b=False)] * 5 + [Row(a=False, b=True)] * 5
    )
    r2 = aggregates.cohens_kappa(anti, F.col("a"), F.col("b")).collect()[0]
    assert r2["kappa_milli"] == -1000
    # textbook mixed case: po=0.6, pe=0.5 -> kappa=0.2 -> 200 exactly
    mixed = spark.createDataFrame(
        [Row(a=True, b=True)] * 3
        + [Row(a=True, b=False)] * 2
        + [Row(a=False, b=True)] * 2
        + [Row(a=False, b=False)] * 3
    )
    r3 = aggregates.cohens_kappa(mixed, F.col("a"), F.col("b")).collect()[0]
    assert r3["kappa_milli"] == 200


def test_weighted_median_boundary_and_weighting(spark):
    # values 1,2,3 with weights 1,1,2: cum at 2 is 2, tot=4 ->
    # 2*2 >= 4 -> lower weighted median is 2 (boundary inclusive)
    df = spark.createDataFrame(
        [
            Row(g="x", v=1, w=1),
            Row(g="x", v=2, w=1),
            Row(g="x", v=3, w=2),
            # group y: heavy weight drags the median up vs unweighted
            Row(g="y", v=1, w=1),
            Row(g="y", v=2, w=1),
            Row(g="y", v=3, w=10),
        ]
    )
    out = {
        r["grp"]: r
        for r in aggregates.weighted_median(
            df, "g", F.col("v"), F.col("w")
        ).collect()
    }
    assert out["x"]["weighted_median"] == 2
    assert out["x"]["total_weight"] == 4
    assert out["y"]["weighted_median"] == 3


def test_nelson_aalen_hand_computed(spark):
    from yellowrush_spark_ml_pipeline_spark.operators import events as ev_ops

    # 4 users sign up at t=0h; conversions at +1h, +1h, +3h; one never
    # converts (censored at corpus end = +3h).
    rows = []
    for u in range(4):
        rows.append(Row(user_id=u, event_type="signup",
                        ts="2024-01-01 00:00:00"))
    rows += [
        Row(user_id=0, event_type="purchase", ts="2024-01-01 01:00:00"),
        Row(user_id=1, event_type="purchase", ts="2024-01-01 01:30:00"),
        Row(user_id=2, event_type="purchase", ts="2024-01-01 03:00:00"),
    ]
    df = spark.createDataFrame(rows).select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {r["t"]: r for r in ev_ops.nelson_aalen(df).collect()}
    # t=1: 2 events, 4 at risk -> h = 0.5; t=3: 1 event, 2 at risk -> 0.5
    assert out[1]["n_risk"] == 4 and out[1]["n_events"] == 2
    assert out[1]["hazard_nano"] == 500_000_000
    assert out[3]["n_risk"] == 2 and out[3]["n_events"] == 1
    assert out[3]["hazard_nano"] == 500_000_000
    assert out[3]["cum_hazard_nano"] == 1_000_000_000


def test_bigram_nll_hand_computed(spark):
    from yellowrush_spark_ml_pipeline_spark.operators import textstats

    # corpus: doc1 "a b a b" (bigrams ab, ba, ab), doc2 "a c" (ac)
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b a b"), Row(doc_id=2, text="a c")]
    )
    out = {r["doc_id"]: r for r in textstats.bigram_nll(df).collect()}
    # counts: c(a,b)=2, c(b,a)=1, c(a,c)=1; c(a.)=3, c(b.)=1; N=4
    # unigram (as w2): c(b)=2, c(a)=1, c(c)=1
    def nll(c_bg, c_w2, c_w1, n=4):
        p = (700 * c_bg * n + 300 * c_w2 * c_w1) / (1000 * c_w1 * n)
        return round(-math.log(p) * 1e9)

    ab = nll(2, 2, 3)
    ba = nll(1, 1, 1)
    ac = nll(1, 1, 3)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_nll_nano"] == (2 * ab + ba) // 3
    assert out[2]["n_bigrams"] == 1
    assert out[2]["avg_nll_nano"] == ac


def test_bigram_nll_penalizes_shuffled_tokens(spark):
    from yellowrush_spark_ml_pipeline_spark.operators import textstats

    # a corpus dominated by fluent word order, plus ONE doc with the
    # same unigram bag but shuffled transitions: the shuffled doc's
    # bigrams are corpus-rare, so its bigram NLL must be higher even
    # though a unigram scorer sees identical token frequencies
    base = "the cat sat on the mat"
    shuf = "the the cat mat sat on"
    df = spark.createDataFrame(
        [Row(doc_id=i, text=base) for i in range(10)]
        + [Row(doc_id=99, text=shuf)]
    )
    out = {r["doc_id"]: r for r in textstats.bigram_nll(df).collect()}
    assert out[99]["avg_nll_nano"] > out[0]["avg_nll_nano"]


def test_bollinger_flags_only_the_spike(spark):
    # 30 calm hours of 5 events, then one 55-event spike hour
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = [
        Row(ts=t0 + timedelta(hours=h, minutes=i))
        for h in range(30)
        for i in range(5)
    ]
    rows += [Row(ts=t0 + timedelta(hours=30, minutes=i)) for i in range(55)]
    df = spark.createDataFrame(rows)
    out = timeseries.bollinger_bands(df).collect()
    hi = [r for r in out if r["breach_hi"]]
    assert len(hi) == 1 and hi[0]["x"] == 55
    assert not any(r["breach_lo"] for r in out)


def test_dedup_eval_counts_and_degenerate_nulls(spark):
    from yellowrush_spark_ml_pipeline_spark.operators import dedup

    found = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=3, id_b=4), Row(id_a=5, id_b=6)]
    )
    truth = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=3, id_b=4), Row(id_a=7, id_b=8)]
    )
    r = dedup.dedup_eval(found, truth).collect()[0]
    assert (r["tp"], r["fp"], r["fn"]) == (2, 1, 1)
    assert r["precision_milli"] == 666 and r["recall_milli"] == 666
    # nothing found -> precision NULL, recall 0
    empty = found.filter(F.lit(False))
    r2 = dedup.dedup_eval(empty, truth).collect()[0]
    assert r2["precision_milli"] is None and r2["recall_milli"] == 0


def test_bpe_merge_rounds_match_canonical_reference(spark):
    """The 5-pass replace merge must equal canonical left-to-right
    greedy BPE (Sennrich 2016) on a corpus with overlapping-occurrence
    words ('aaaa', 'ababab') that stress the separator-sharing defer."""
    import re
    from collections import Counter

    from yellowrush_spark_ml_pipeline_spark.operators.textstats import (
        bpe_merge_rounds,
    )

    texts = [
        "the cat sat on the mat",
        "aaaa aaaa ababab ababab ababab",
        "banana bandana banana",
        "low lower lowest low low",
    ]
    words = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                words[w[:24]] += 1

    def canonical(words, rounds):
        vocab = {w: list(w) for w in words}
        merges = []
        for r in range(rounds):
            pc = Counter()
            for w, n in words.items():
                s = vocab[w]
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += n
            if not pc:
                break
            (l, rr), cnt = sorted(
                pc.items(), key=lambda kv: (-kv[1], kv[0])
            )[0]
            merges.append((r + 1, l, rr, cnt))
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
        return merges

    df = spark.createDataFrame([Row(text=t) for t in texts])
    got = [
        (r["merge_round"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_merge_rounds(df, rounds=4).orderBy("merge_round").collect()
    ]
    assert got == canonical(words, 4)


def test_cms_estimate_upper_bounds_and_exact_singletons(spark):
    """CMS estimates are always >= true counts (one-sided error), and a
    key whose buckets collide with nothing in some row is exact."""
    rows = [Row(k="hot")] * 50 + [Row(k=f"cold{i}") for i in range(10)]
    got = {
        r["key"]: (r["true_count"], r["cms_count"])
        for r in sketches.cms_heavy_hitters(
            spark.createDataFrame(rows), "k", top_k=11
        ).collect()
    }
    assert got["hot"][0] == 50
    for key, (true, est) in got.items():
        assert est >= true
    # with 11 keys across 4x128 buckets, the min-of-rows estimate for the
    # hot key is exact unless every one of its 4 buckets collides
    assert got["hot"][1] == 50


def test_label_propagation_two_cliques(spark):
    """Two disjoint triangles converge to per-clique min labels."""
    from yellowrush_spark_ml_pipeline_spark.operators.graph import (
        label_propagation,
    )

    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    lab = {r["node"]: r["label"] for r in label_propagation(df, 3).collect()}
    assert {lab[1], lab[2], lab[3]} == {1}
    assert {lab[10], lab[11], lab[12]} == {10}


def test_winnowing_guarantee_shared_substring(spark):
    """Any shared substring of length >= k + w - 1 (= 11) must produce
    at least one shared fingerprint — the paper's core guarantee."""
    from yellowrush_spark_ml_pipeline_spark.operators.dedup import (
        winnow_overlap_pairs,
    )

    shared = "zqxjkwvbnmp"  # 11 chars, appears in both docs
    rows = [
        Row(doc_id=1, text=f"alpha beta {shared} gamma delta"),
        Row(doc_id=2, text=f"completely different prefix {shared} and tail"),
        Row(doc_id=3, text="no overlap here at all whatsoever today"),
    ]
    pairs = winnow_overlap_pairs(
        spark.createDataFrame(rows), min_shared=1, max_fp_df=10
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got


def test_interpolate_linear_hand_computed(spark):
    """Interior gap is the exact linear bracket; edges take the nearest
    non-null neighbor."""
    from yellowrush_spark_ml_pipeline_spark.operators.timeseries import (
        interpolate_linear,
    )

    rows = [
        Row(g="a", t=0, v=None),   # leading -> next = 10.0
        Row(g="a", t=1, v=10.0),
        Row(g="a", t=2, v=None),   # 10 + (40-10)*(2-1)/(4-1) = 20
        Row(g="a", t=3, v=None),   # 10 + 30*2/3 = 30
        Row(g="a", t=4, v=40.0),
        Row(g="a", t=5, v=None),   # trailing -> prev = 40.0
    ]
    got = {
        r["t"]: r["filled"]
        for r in interpolate_linear(
            spark.createDataFrame(rows), ["g"], "t", "v"
        ).collect()
    }
    assert got == {0: 10.0, 1: 10.0, 2: 20.0, 3: 30.0, 4: 40.0, 5: 40.0}


def test_fd_violations_detects_only_planted(spark):
    """A clean FD yields zero rows; one planted conflict yields exactly
    that determinant with both example values."""
    clean = [Row(k=i, d=i * 10) for i in range(20)]
    df = spark.createDataFrame(clean)
    assert aggregates.fd_violations(df, ["k"], "d").count() == 0
    dirty = spark.createDataFrame(clean + [Row(k=7, d=999)])
    got = aggregates.fd_violations(dirty, ["k"], "d").collect()
    assert len(got) == 1
    assert got[0]["k"] == 7
    assert (got[0]["example_a"], got[0]["example_b"]) == (70, 999)
    assert got[0]["n_dependents"] == 2


def test_calibration_bins_perfectly_calibrated_score(spark):
    """A score that equals the empirical positive rate per bin has
    frac_pos == mean_score and Brier == score*(1-score)."""
    rows = []
    for _ in range(80):
        rows.append(Row(score=0.25, label=0))
    for _ in range(20):
        rows.append(Row(score=0.25, label=1))
    for _ in range(30):
        rows.append(Row(score=0.85, label=1))
    for _ in range(10):
        rows.append(Row(score=0.85, label=0))
    got = {
        r["bin"]: r
        for r in aggregates.calibration_bins(
            spark.createDataFrame(rows), "score", "label"
        ).collect()
    }
    assert got[2]["n"] == 100 and got[2]["frac_pos"] == 0.2
    assert got[2]["mean_score"] == 0.25
    assert abs(got[2]["brier"] - (0.75**2 * 0.2 + 0.25**2 * 0.8)) < 1e-9
    assert got[8]["n"] == 40 and got[8]["frac_pos"] == 0.75


def test_k_anonymity_histogram(spark):
    """Hand-built classes: sizes 1,1,3 -> histogram rows (1,2,2,at_risk)
    and (3,1,3,ok for k<=3... at_risk under k=5)."""
    rows = [
        Row(a="x", b=1),
        Row(a="y", b=1),
        Row(a="z", b=1),
        Row(a="z", b=1),
        Row(a="z", b=1),
    ]
    got = {
        r["class_size"]: r
        for r in aggregates.k_anonymity_profile(
            spark.createDataFrame(rows), ["a"], k=5
        ).collect()
    }
    assert got[1]["n_classes"] == 2 and got[1]["n_rows"] == 2
    assert got[1]["at_risk"] == 1
    assert got[3]["n_classes"] == 1 and got[3]["at_risk"] == 1


def test_quantized_recall_identity_when_lossless(spark):
    """Vectors already on the quantization lattice dequantize exactly,
    so recall@k must be 1.0 for every query."""
    from yellowrush_spark_ml_pipeline_spark.operators.similarity import (
        quantized_recall,
    )

    import random

    rnd = random.Random(7)
    # pin 0 and 255 into every vector so scale == 1 exactly: quantization
    # is then the identity and the approx ranking must equal the exact one
    rows = [
        Row(
            vec_id=i,
            embedding=[0.0, 255.0]
            + [float(rnd.randint(0, 255)) for _ in range(6)],
        )
        for i in range(30)
    ]
    corpus = spark.createDataFrame(rows)
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = quantized_recall(corpus, queries, k=5).collect()
    assert len(got) == 3
    assert all(r["recall"] == 1.0 for r in got)


def test_golden_record_per_column_backfill(spark):
    """The newest row's null columns backfill from older rows — the
    behavior that distinguishes survivorship from latest-row-wins."""
    from yellowrush_spark_ml_pipeline_spark.operators.mutations import (
        golden_record,
    )

    rows = [
        Row(k=1, t=1, a="old_a", b=1.0),
        Row(k=1, t=2, a="new_a", b=None),   # newest: b must backfill to 1.0
        Row(k=2, t=5, a=None, b=7.0),
        Row(k=2, t=9, a=None, b=None),      # both backfill
    ]
    got = {
        r["k"]: r
        for r in golden_record(
            spark.createDataFrame(rows), ["k"], ["a", "b"], "t",
            tiebreak_col="t",
        ).collect()
    }
    assert (got[1]["a"], got[1]["b"]) == ("new_a", 1.0)
    assert got[1]["n_sources"] == 2 and got[1]["last_seen"] == 2
    assert (got[2]["a"], got[2]["b"]) == (None, 7.0)
    assert got[2]["last_seen"] == 9


def test_histogram_percentiles_exact_on_uniform(spark):
    """On 0..255 repeated, every value is its own bin boundary: the
    estimate must land within one bin width of the exact percentile,
    and exact must be the type-1 quantile."""
    rows = [Row(v=float(i % 256)) for i in range(2560)]
    got = {
        r["p"]: r
        for r in sketches.histogram_percentiles(
            spark.createDataFrame(rows), "v", ps=(0.5, 0.99)
        ).collect()
    }
    assert got[0.5]["exact_value"] == 127.0  # rank 1280 -> value 127
    assert abs(got[0.5]["err"]) <= (255.0 / 256.0) + 1e-9
    assert got[0.99]["exact_value"] == 253.0
    assert abs(got[0.99]["err"]) <= (255.0 / 256.0) + 1e-9


def test_ndcg_perfect_ranking_and_exact_dcg(spark):
    """Docs whose BM25 order equals the relevance order give NDCG 1.0
    with the exact integer DCG (3*w1 + 2*w2 + 1*w3)."""
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import (
        ndcg_at_k,
        ndcg_weights,
    )

    rows = [
        Row(doc_id=1, text="hash join vector table scan"),
        Row(doc_id=2, text="hash join table scan filter"),
        Row(doc_id=3, text="hash table scan filter sort"),
        Row(doc_id=4, text="table scan filter sort merge"),
    ]
    got = ndcg_at_k(
        spark.createDataFrame(rows), ["hash", "join", "vector"], k=10
    ).collect()[0]
    w = ndcg_weights(10)
    want_dcg = 3 * w[0] + 2 * w[1] + 1 * w[2]
    assert got["dcg_micro"] == want_dcg
    assert got["idcg_micro"] == want_dcg
    assert got["ndcg"] == 1.0
