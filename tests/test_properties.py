"""Property-based tests (hypothesis) for the pure scalar/column layer:
the engine's derivations must agree with a plain-Python reference on
arbitrary inputs, not just the fixture distribution.

Strategy: generate small row sets driver-side, run the Column expression
through a real (session-scoped) SparkSession, compare to the Python model.
Deterministic seeds; examples kept small so each property is one job.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from yellowrush_spark_ml_pipeline_spark.functions.scalar import (
    binary_flag,
    safe_div,
    time_period,
)
from yellowrush_spark_ml_pipeline_spark.operators.cleaning import (
    filter_ranges,
    range_predicate,
)

_SETTINGS = settings(
    max_examples=20,
    deadline=None,
    derandomize=True,  # green must be reproducible run-to-run; interesting
    # boundary cases are pinned with @example instead of left to chance
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(hours=st.lists(st.integers(min_value=0, max_value=23), min_size=1, max_size=20))
@_SETTINGS
def test_time_period_total_partition(spark, hours):
    """Every hour maps to exactly one bin, matching the reference's
    CASE chain (nyc_taxi_final.py:428-434)."""

    def model(h):
        if 6 <= h <= 11:
            return "morning"
        if 12 <= h <= 16:
            return "afternoon"
        if 17 <= h <= 23:
            return "evening"
        return "night"

    df = spark.createDataFrame([(h,) for h in hours], ["h"])
    got = [r.p for r in df.select(time_period(F.col("h")).alias("p")).collect()]
    assert got == [model(h) for h in hours]


@given(
    rows=st.lists(
        st.tuples(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
    ),
    low=st.floats(min_value=-100, max_value=100, allow_nan=False),
    span=st.floats(min_value=0, max_value=200, allow_nan=False),
    li=st.booleans(),
    hi=st.booleans(),
)
@_SETTINGS
def test_filter_ranges_matches_python_predicate(spark, rows, low, span, li, hi):
    high = low + span
    df = spark.createDataFrame(rows, ["a", "b"])
    got = sorted(
        (r.a, r.b)
        for r in filter_ranges(df, {"a": (low, high, li, hi)}).collect()
    )

    def keep(a):
        lo_ok = a >= low if li else a > low
        hi_ok = a <= high if hi else a < high
        return lo_ok and hi_ok

    want = sorted((a, b) for a, b in rows if keep(a))
    assert got == want


@given(
    pairs=st.lists(
        st.tuples(
            st.floats(min_value=-1e4, max_value=1e4, allow_nan=False),
            st.floats(min_value=0.0, max_value=1e4, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
    )
)
@_SETTINGS
def test_safe_div_never_null_or_inf(spark, pairs):
    """The epsilon guard must make division total: finite output for any
    finite input including a zero denominator."""
    df = spark.createDataFrame(pairs, ["n", "d"])
    vals = [
        r.v for r in df.select(safe_div(F.col("n"), F.col("d")).alias("v")).collect()
    ]
    assert all(v is not None and math.isfinite(v) for v in vals)
    for (n, d), v in zip(pairs, vals):
        assert v == n / (d + 1e-6)


@given(
    vals=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=30),
    threshold=st.integers(min_value=-500, max_value=500),
)
@_SETTINGS
def test_binary_flag_is_indicator(spark, vals, threshold):
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = [
        r.f
        for r in df.select(binary_flag(F.col("x") > threshold).alias("f")).collect()
    ]
    assert got == [1 if v > threshold else 0 for v in vals]


@given(
    gaps=st.lists(
        st.integers(min_value=1, max_value=7200), min_size=1, max_size=30
    ),
    gap_minutes=st.integers(min_value=1, max_value=60),
)
@_SETTINGS
def test_sessionize_breaks_exactly_on_gap(spark, gaps, gap_minutes):
    """Sessions break exactly where the inter-event gap exceeds the
    threshold: session_id = 1 + count of preceding gaps > threshold."""
    import datetime as dt

    from yellowrush_spark_ml_pipeline_spark.streaming import sessionize

    t0 = dt.datetime(2024, 1, 1)
    ts, acc = [t0], 0
    for g in gaps:
        acc += g
        ts.append(t0 + dt.timedelta(seconds=acc))
    rows = [(i, 1, t) for i, t in enumerate(ts)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    got = {
        r.event_id: r.session_id
        for r in sessionize(df, "ts", "user_id", gap_minutes).collect()
    }
    want, sid = {0: 1}, 1
    for i, g in enumerate(gaps):
        if g > gap_minutes * 60:
            sid += 1
        want[i + 1] = sid
    assert got == want


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs"),
                max_codepoint=0x2FF,
            ),
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
@_SETTINGS
def test_tokens_match_python_model(spark, texts):
    """`tokens` (split on non-letter/digit runs, lowercased, no empties)
    must agree with the plain-Python re model — the dedup stack's shingle
    alphabet rides on this."""
    import re

    from yellowrush_spark_ml_pipeline_spark.functions.text import tokens

    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [r.tok for r in df.select(tokens(F.col("text")).alias("tok")).collect()]
    want = [
        [t for t in re.split(r"[\W_]+", s.lower(), flags=re.UNICODE) if t]
        for s in texts
    ]
    assert got == want


@given(
    words=st.lists(
        st.text(alphabet="abcdefg", min_size=1, max_size=6), min_size=1, max_size=12
    ),
    n=st.integers(min_value=2, max_value=4),
)
@_SETTINGS
def test_shingles_count_and_first(spark, words, n):
    from yellowrush_spark_ml_pipeline_spark.functions.text import shingles, tokens

    text = " ".join(words)
    df = spark.createDataFrame([(text,)], ["text"])
    sh = [
        r.s
        for r in df.select(
            shingles(tokens(F.col("text")), n).alias("s")
        ).collect()
    ][0]
    assert len(sh) == max(len(words) - n, 0) + 1
    assert sh[0] == " ".join(words[:n])


@given(x=st.floats(min_value=-50, max_value=50, allow_nan=False))
@_SETTINGS
def test_range_predicate_unbounded_sides(spark, x):
    """None bounds mean unbounded: (None, None) accepts everything."""
    df = spark.createDataFrame([(x,)], ["a"])
    assert df.filter(range_predicate(F.col("a"))).count() == 1


@given(
    words=st.lists(
        st.text(alphabet="abcdefgh", min_size=1, max_size=8), min_size=1, max_size=120
    ),
    chunk=st.integers(min_value=20, max_value=100),
    overlap=st.integers(min_value=0, max_value=19),
)
@_SETTINGS
def test_chunk_text_lossless_for_any_text(spark, words, chunk, overlap):
    """Chunking must be lossless for ANY text/params: chunk 0 plus each
    later chunk minus its overlap prefix reassembles the original."""
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import chunk_text

    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = (
        chunk_text(df, chunk_chars=chunk, overlap=overlap)
        .orderBy("chunk_id")
        .collect()
    )
    rebuilt = rows[0].chunk_text + "".join(r.chunk_text[overlap:] for r in rows[1:])
    assert rebuilt == text
    step = chunk - overlap
    assert [r.chunk_start for r in rows] == [1 + step * i for i in range(len(rows))]


@given(
    vec=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=2,
        max_size=16,
    )
)
@_SETTINGS
def test_quantize_roundtrip_for_any_vector(spark, vec):
    """Scalar quantization: codes in [0,255] and dequantization within
    half a step, for arbitrary vectors including constants."""
    from yellowrush_spark_ml_pipeline_spark.operators.similarity import (
        quantize_embeddings,
    )

    df = spark.createDataFrame([(1, vec)], ["vec_id", "embedding"])
    (row,) = quantize_embeddings(df).collect()
    assert all(0 <= c <= 255 for c in row.codes)
    for c, x in zip(row.codes, vec):
        assert abs(c * row.scale + row.offset - x) <= row.scale / 2 + 1e-9


@given(
    vals=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60),
    q=st.integers(min_value=1, max_value=100),
)
@_SETTINGS
def test_quantile_cutoff_matches_percentile_disc(spark, vals, q):
    """The histogram-ranked cutoff must equal the classic sorted-list
    percentile_disc definition: the ceil(q% * n)-th smallest element."""
    from yellowrush_spark_ml_pipeline_spark.operators.aggregates import (
        quantile_cutoff,
    )

    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    row = quantile_cutoff(df, "v", q_pct=q).first()
    k = -(-q * len(vals) // 100)  # ceil
    expect = sorted(vals)[k - 1]
    assert row["cutoff"] == expect, (vals, q, row)
    assert row["n_at_or_below"] + row["n_above"] == len(vals)
    assert row["n_at_or_below"] == sum(1 for v in vals if v <= row["cutoff"])


@given(
    lens=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=40),
    cap=st.integers(min_value=16, max_value=256),
)
@_SETTINGS
def test_pack_sequences_bin_math(spark, lens, cap):
    """Bin ids are the running-start offset div capacity: contiguous in id
    order, never decreasing, and every doc's start offset lands inside
    its bin's window."""
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import (
        pack_sequences,
    )

    rows = [(i, "x", " ".join(["w"] * n)) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = sorted(
        pack_sequences(df, capacity=cap).collect(), key=lambda r: r.doc_id
    )
    run = 0
    prev_bin = 0
    for r, n in zip(out, lens):
        assert r.n_tokens == n
        assert r.start_offset == run
        assert r.bin_id == run // cap
        assert r.bin_id >= prev_bin
        prev_bin = r.bin_id
        run += n


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    w=st.integers(min_value=1, max_value=14),
    h=st.integers(min_value=1, max_value=14),
)
@example(seed=0, w=2, h=2)  # round-4 falsifier: quantization alone moves a
# 4-pixel high-frequency image's channel mean by 7.0 — codec is sound, the
# old fixed 6.0 bound was miscalibrated for sub-4x4 images.
@_SETTINGS
def test_jpeg_roundtrip_mean_accuracy(seed, w, h):
    """Arbitrary small images (any dims, LCG-generated pixels) must
    survive encode→decode with exact dims and channel means within a few
    units — quantization moves pixels locally, never the mean far. The
    bound scales for tiny images: below ~4x4 a single 8x8 DCT block is
    mostly replication padding and quantization error concentrates in the
    few real pixels (measured: q90 error up to 8.0 on 2x2 inputs).
    Pure-Python property, no Spark session needed."""
    from yellowrush_spark_ml_pipeline_spark.operators.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    state = seed or 1
    px = []
    for _ in range(h):
        row = []
        for _ in range(w):
            vals = []
            for _ in range(3):
                state = (state * 1103515245 + 12345) % (1 << 31)
                vals.append((state >> 16) % 256)
            row.append(tuple(vals))
        px.append(row)
    w2, h2, rows = decode_jpeg_pixels(encode_jpeg(px, quality=90))
    assert (w2, h2) == (w, h)
    n = w * h
    bound = 6.0 + 24.0 / max(min(w, h), 1)  # 6.0 for w,h>=24; 18.0 at 2x2
    for ch in range(3):
        true_mean = sum(p[ch] for row in px for p in row) / n
        got_mean = sum(p[ch] for row in rows for p in row) / n
        assert abs(got_mean - true_mean) < bound, (ch, true_mean, got_mean)


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),      # user
            st.sampled_from(["view", "click", "purchase", "other"]),
            st.integers(min_value=0, max_value=20),     # minute (collisions likely)
        ),
        min_size=1,
        max_size=40,
    )
)
@_SETTINGS
def test_funnel_variants_agree_and_match_python_model(spark, events):
    """Both funnel physical strategies must equal a plain-Python
    first-touch model on arbitrary event logs — including same-timestamp
    collisions and out-of-order stages."""
    import datetime as dt

    from yellowrush_spark_ml_pipeline_spark.operators import events as events_ops

    stages = ["view", "click", "purchase"]
    rows = [
        (u, t, dt.datetime(2024, 1, 1, 0, m)) for u, t, m in events
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])

    # Python reference: frontier[k] = min ts of stage-k events strictly
    # after frontier[k-1].
    expected = {s: 0 for s in stages}
    for u in {r[0] for r in rows}:
        mine = [(t, ty) for (uu, ty, t) in rows if uu == u]
        prev = None
        for k, s in enumerate(stages):
            cand = [t for t, ty in mine if ty == s and (k == 0 or (prev is not None and t > prev))]
            if k > 0 and prev is None:
                break
            if not cand:
                break
            prev = min(cand)
            expected[s] += 1

    a = {r.stage: r.n_users for r in events_ops.funnel_counts(df, stages).collect()}
    b = {
        r.stage: r.n_users
        for r in events_ops.funnel_counts_window(df, stages).collect()
    }
    assert a == b == expected


@given(
    lens=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=40),
    cap=st.integers(min_value=16, max_value=256),
)
@_SETTINGS
def test_pack_efficiency_reconciles_with_assignment(spark, lens, cap):
    """The efficiency audit's integer facts must reconcile exactly with a
    plain-Python replay of the packing."""
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import (
        pack_efficiency,
        pack_sequences,
    )

    rows = [(i, "x", " ".join(["w"] * n)) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = pack_efficiency(pack_sequences(df, capacity=cap), capacity=cap).collect()
    assert len(out) == 1
    r = out[0]
    bins: dict[int, int] = {}
    run = 0
    for n in lens:
        bins[run // cap] = bins.get(run // cap, 0) + n
        run += n
    assert r.n_bins == len(bins)
    assert r.n_docs == len(lens)
    assert r.total_tokens == sum(lens)
    assert r.max_bin_tokens == max(bins.values())
    assert r.underfilled_bins == sum(1 for v in bins.values() if v * 2 < cap)
    assert r.fill_pct == (sum(lens) * 100) // (len(bins) * cap)


@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(1, 50)),
        min_size=1,
        max_size=30,
    )
)
@_SETTINGS
def test_mixture_allocation_conserves_budget(spark, docs):
    """Allocations are proportional floor shares: each source gets
    floor(B * w / W), so the total never exceeds the budget and is within
    n_sources of it; weights are exactly Σ tokens × quality×100."""
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import (
        mixture_allocation,
    )

    rows = [
        (i, src, " ".join(["the"] * n))
        for i, (src, n) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = mixture_allocation(df, token_budget=10_000).collect()
    total_alloc = sum(r.alloc_tokens for r in out)
    assert total_alloc <= 10_000
    assert 10_000 - total_alloc < max(len(out), 1) + 1
    w_total = sum(r.weight for r in out)
    for r in out:
        assert r.alloc_tokens == 10_000 * r.weight // w_total


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=10_000_00),  # cents-scale
        ),
        min_size=2,
        max_size=25,
    )
)
@_SETTINGS
def test_regression_metrics_invariants(spark, rows):
    """On arbitrary grouped money data: n is exact, mae/rmse are
    non-negative with rmse >= mae (power-mean inequality), r2 <= 1, and
    a perfect predictor (constant per group, all groups equal) yields
    mae = rmse = 0."""
    from yellowrush_spark_ml_pipeline_spark.ml.pipelines import (
        baseline_regression_metrics,
    )

    df = spark.createDataFrame(
        [(g, cents / 100.0) for g, cents in rows], ["grp", "price"]
    )
    r = baseline_regression_metrics(df, "price", "grp").collect()[0]
    assert r.n == len(rows)
    assert r.mae >= 0 and r.rmse >= 0
    assert r.rmse >= r.mae - 1e-12  # QM >= AM on |errors|
    if r.r2 is not None:  # sst=0 (all values equal) -> null r2
        assert r.r2 <= 1.0 + 1e-12


@given(
    left_keys=st.sets(st.integers(min_value=0, max_value=30), max_size=15),
    right_keys=st.sets(st.integers(min_value=0, max_value=30), max_size=15),
)
@_SETTINGS
def test_full_outer_reconcile_partitions_key_space(spark, left_keys, right_keys):
    """Status counts partition |L ∪ R| exactly: both = |L ∩ R|,
    left_only = |L \\ R|, right_only = |R \\ L|."""
    from yellowrush_spark_ml_pipeline_spark.operators.joins import (
        full_outer_reconcile,
    )

    if not left_keys and not right_keys:
        return
    left = spark.createDataFrame(
        [(k, f"l{k}") for k in left_keys] or [(None, None)], "k long, lp string"
    ).filter(F.col("k").isNotNull())
    right = spark.createDataFrame(
        [(k, k * 10) for k in right_keys] or [(None, None)], "k long, rp long"
    ).filter(F.col("k").isNotNull())
    got = {
        r.status: r.n_keys
        for r in full_outer_reconcile(left, right, "k", "lp", "rp").collect()
    }
    assert got.get("both", 0) == len(left_keys & right_keys)
    assert got.get("left_only", 0) == len(left_keys - right_keys)
    assert got.get("right_only", 0) == len(right_keys - left_keys)


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # user
            st.integers(min_value=0, max_value=3),   # type index
        ),
        min_size=1,
        max_size=40,
    )
)
@_SETTINGS
def test_event_transitions_matches_python_pairwise_model(spark, events):
    """Transition counts must equal the plain-Python pairwise model over
    each user's (ts, event_id)-ordered stream, for arbitrary event logs
    (including same-timestamp runs, which order by event_id)."""
    import datetime as dt

    from yellowrush_spark_ml_pipeline_spark.operators.events import (
        event_transitions,
    )

    types = ["a", "b", "c", "d"]
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i // 2), u, types[t], 0.0)
        for i, (u, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {
        (r.prev_type, r.next_type): r.n_transitions
        for r in event_transitions(df).collect()
    }
    model: dict = {}
    per_user: dict = {}
    for i, (u, t) in enumerate(events):
        per_user.setdefault(u, []).append((rows[i][1], i, types[t]))
    for seq in per_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            model[(a, b)] = model.get((a, b), 0) + 1
    assert got == model


@given(
    docs=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=6), min_size=0, max_size=14
        ),
        min_size=1,
        max_size=6,
    )
)
@_SETTINGS
def test_dup_ngram_spans_matches_python_model(spark, docs):
    """Span output must equal the brute-force Python model (positions of
    n-grams shared by >=2 docs, merged into maximal runs) on arbitrary
    token lists — including short docs (< n tokens -> one truncated
    shingle) and empty docs."""
    from yellowrush_spark_ml_pipeline_spark.operators.dedup import (
        duplicate_ngram_spans,
    )

    n = 3
    texts = [" ".join(f"w{t}" for t in toks) for toks in docs]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_dup_grams)
        for r in duplicate_ngram_spans(df, ngram_n=n, min_docs=2).collect()
    }

    def grams(toks):
        if not toks:
            return []
        words = [f"w{t}" for t in toks]
        if len(words) >= n:
            return [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
        return [" ".join(words)]

    per_doc = [grams(t) for t in docs]
    from collections import Counter

    doc_freq = Counter()
    for gs in per_doc:
        for g in set(gs):
            doc_freq[g] += 1
    expected = set()
    for d, gs in enumerate(per_doc):
        dup_pos = [i for i, g in enumerate(gs) if doc_freq[g] >= 2]
        run: list = []
        for p in dup_pos + [None]:
            if run and (p is None or p != run[-1] + 1):
                expected.add((d, run[0], run[-1], len(run)))
                run = []
            if p is not None:
                run.append(p)
    assert got == expected


# ------------------------------------------------------------- fuzzy_pairs


@given(
    base=st.text(alphabet="abcdefg ", min_size=20, max_size=60),
    edit_kind=st.sampled_from(["sub", "ins", "del", "none"]),
    pos_frac=st.floats(min_value=0.0, max_value=1.0),
    data=st.data(),
)
@_SETTINGS
def test_fuzzy_pairs_blocking_complete_for_any_single_edit(
    spark, base, edit_kind, pos_frac, data
):
    """The two-ended pigeonhole blocking must find the pair for ANY
    single edit at ANY position (the completeness theorem the oracle
    also checks, here exercised on arbitrary strings/edit sites)."""
    from yellowrush_spark_ml_pipeline_spark.operators.dedup import fuzzy_pairs

    if len(base) <= 17:
        base = base + "x" * (18 - len(base))
    pos = min(int(pos_frac * len(base)), len(base) - 1)
    ch = data.draw(st.sampled_from("xyz"))  # outside the base alphabet+space? z not in alphabet
    if edit_kind == "sub":
        edited = base[:pos] + ch + base[pos + 1 :]
    elif edit_kind == "ins":
        edited = base[:pos] + ch + base[pos:]
    elif edit_kind == "del":
        edited = base[:pos] + base[pos + 1 :]
    else:
        edited = base
    if len(edited) <= 17:
        return  # deletion shrank below the operator's length contract
    left = spark.createDataFrame([(1, base)], "id_a long, key string")
    right = spark.createDataFrame([(2, edited)], "id_b long, key string")
    got = fuzzy_pairs(left, right, "key", "id_a", "id_b").collect()
    want_dist = 0 if edited == base else 1
    assert len(got) == 1
    assert got[0].edit_distance == want_dist


@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=2_000_000), min_size=1, max_size=6
    )
)
@example(counts=[1_000_000])          # the r9 ADVICE overflow repro scale
@example(counts=[70_000])             # the pre-fix threshold (~7e4)
@example(counts=[2_000_000, 1])       # extreme skew: tiny source clamps
@_SETTINGS
def test_temperature_mixture_rates_match_python_ints(spark, counts):
    """The per-source keep-rate must equal the exact Python-int model
    rate = min(1e6, (N // 2) * s_micro * 1e6 // (S * n)) with s_micro =
    floor(sqrt(n) * 1e6) — for ANY source-count profile, including the
    magnitudes where the pre-r10 LONG arithmetic overflowed (Spark's
    `div` returns LONG, so the old CAST(_N AS DECIMAL) div 2 collapsed
    the whole numerator to 64-bit).  Rates are checked, not the row
    selection, so corpora here are 1-row-per-source with a planted _n."""
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import (
        temperature_mixture_sample,
    )

    s_micro = [math.floor(math.sqrt(n) * 1_000_000) for n in counts]
    big_s, big_n = sum(s_micro), sum(counts)
    model = {
        f"s{i}": min(
            1_000_000,
            (big_n // 2) * s_micro[i] * 1_000_000 // (big_s * counts[i]),
        )
        for i in range(len(counts))
    }
    # drive the REAL operator on a corpus whose groupBy yields exactly
    # `counts`: sequence() explode stays JVM-side, and 2e6 rows is a
    # trivial local job
    df = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"s{i}").alias("source"), F.lit(n).alias("_n")
                    )
                    for i, n in enumerate(counts)
                ]
            )
        ).alias("e")
    ).select(
        F.col("e.source").alias("source"),
        F.explode(F.sequence(F.lit(1), F.col("e._n"))).alias("k"),
    ).select(
        "source",
        (F.xxhash64("source") + F.col("k")).alias("doc_id"),
    )
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import (
        temperature_mixture_rates,
    )

    # assert against the FULL per-source rate relation, not surviving
    # rows: a source with a small positive rate can legitimately lose
    # every hash draw and vanish from the sample (the r10 ADVICE
    # fragility) — its rate must still be exact
    rows = {
        r["source"]: r["rate_micro"]
        for r in temperature_mixture_rates(df, "source").collect()
    }
    assert set(rows) == set(model)
    for src_name, want in model.items():
        assert rows[src_name] == want, (src_name, rows[src_name], want, counts)
    # the sample itself must carry only rates from that relation, and
    # only rows whose source rate is positive
    out = temperature_mixture_sample(df, "source", "doc_id")
    sampled = {
        r["source"]: r["rate_micro"]
        for r in out.select("source", "rate_micro").distinct().collect()
    }
    for src_name, got in sampled.items():
        assert got == model[src_name] and got > 0, (src_name, got)
