"""Physical-plan assertions — the scale contract, checked mechanically.

These tests pin the plan properties that decide whether a query survives a
100 TB deployment: filters reaching the parquet scan, broadcast joins where
(and ONLY where) a dim is bounded, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import re

import __spark_entry__ as entrymod
from yellowrush_spark_ml_pipeline_spark.operators import joins
from yellowrush_spark_ml_pipeline_spark.plans.explain import explain_str, plan_report
from yellowrush_spark_ml_pipeline_spark.sources import load_table


def test_range_filter_pushdown(spark, sf_small):
    rep = plan_report(entrymod.q_range_filter(spark, sf_small))
    assert rep["pushed_filters"], "range predicates must reach the parquet scan"
    assert rep["whole_stage_codegen"]
    assert not rep["python_udf"]


def test_dim_join_broadcasts_small_dim_via_aqe(spark, sf_small):
    df = entrymod.q_dim_join_null_fill(spark, sf_small)
    # No pinned hint: the plan must still pick BHJ at this SF (AQE or the
    # static size estimate — part.parquet is tiny here), proving we didn't
    # trade the fast small-scale plan for scale safety.
    df.write.format("noop").mode("overwrite").save()  # let AQE finalize
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan
    # ...and the plan must NOT contain a pinned broadcast of the dim: the
    # logical plan carries no ResolvedHint when broadcast=None.
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical


def test_star_join_pins_only_fixed_dims(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    customer = load_table(spark, sf_small, "customer")
    nation = load_table(spark, sf_small, "nation")
    joined = joins.star_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        [
            (customer.select("c_custkey", "c_nationkey"), "c_custkey", None),
            (nation.select(F.col("n_nationkey").alias("c_nationkey"), "n_name"), "c_nationkey", True),
        ],
    )
    logical = joined._jdf.queryExecution().analyzed().toString()
    # exactly one pinned broadcast hint (nation), none for customer
    assert logical.count("UnresolvedHint broadcast") + logical.count(
        "ResolvedHint (strategy=broadcast)"
    ) == 1, logical


def test_no_broadcast_flag_forces_shuffle_join(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_small, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_retailprice"
    )
    df = joins.broadcast_dim_join(li, part, on="l_partkey", broadcast=False)
    plan = explain_str(df)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_salted_join_equals_plain_join(spark, sf_small):
    """Salting redistributes hot keys but must never change results; the
    physical join keys must include the salt so the hot key actually
    splits across salt_buckets tasks."""
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_small, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_retailprice"
    )
    salted = joins.salted_join(li, part, on="l_partkey", salt_buckets=4)
    plain = li.join(part, "l_partkey")
    assert salted.count() == plain.count() > 0
    s_sum = salted.agg(F.sum("p_retailprice")).first()[0]
    p_sum = plain.agg(F.sum("p_retailprice")).first()[0]
    assert abs(s_sum - p_sum) < 1e-6
    assert "_salt" in explain_str(salted), "salt must be part of the join keys"


def test_asof_join_edge_semantics(spark):
    """Backward as-of: same-instant right rows ARE visible (>= semantics),
    rows with no prior state get null, later states don't leak backward."""
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 12, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 1, t(0)), (2, 1, t(10)), (3, 1, t(20)), (4, 2, t(5))],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [(1, t(10), 100.0), (1, t(15), 200.0), (3, t(0), 999.0)],
        ["user_id", "ts", "state"],
    )
    out = {
        r.event_id: r.state
        for r in joins.asof_join(left, right, "user_id", value_cols=["state"]).collect()
    }
    assert out[1] is None  # before any state
    assert out[2] == 100.0  # same-instant state visible (>=)
    assert out[3] == 200.0  # latest prior, not first
    assert out[4] is None  # other key's state never leaks


def test_asof_join_tied_right_rows_deterministic(spark):
    """Two right states at the identical (key, ts) must resolve to the
    value-column-largest row, independent of shuffle order."""
    import datetime as dt

    ts = dt.datetime(2024, 1, 1, 12, 0)
    left = spark.createDataFrame([(1, 1, ts)], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        [(1, ts, 10.0), (1, ts, 99.0)], ["user_id", "ts", "state"]
    )
    for _ in range(3):
        row = joins.asof_join(left, right, "user_id", value_cols=["state"]).first()
        assert row.state == 99.0


def test_salted_join_rejects_dim_preserving_types(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_small, "part").select(
        F.col("p_partkey").alias("l_partkey")
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="inner/left"):
        joins.salted_join(li, part, on="l_partkey", how="full")


def test_salted_join_under_hot_key_skew(spark):
    """Stress the skew case salting exists for: 90% of fact rows share one
    key. The salted join must (a) return exactly the plain join's result
    and (b) split the hot key across salt buckets."""
    fact = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("row_id"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("payload")
    )
    salted = joins.salted_join(fact, dim, on="k", salt_buckets=8)
    plain = fact.join(dim, "k")
    assert salted.count() == plain.count() > 15000
    assert (
        salted.agg(F.sum("payload")).first()[0]
        == plain.agg(F.sum("payload")).first()[0]
    )
    # the hot key's rows really carry >1 distinct salt (split across tasks)
    hot_salts = (
        fact.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8)),
        )
        .filter(F.col("k") == 7)
        .select("_salt")
        .distinct()
        .count()
    )
    assert hot_salts > 1


def test_group_enrich_window_single_shuffle(spark, sf_small):
    df = entrymod.q_window_enrich(spark, sf_small)
    rep = plan_report(df)
    assert rep["exchanges"] <= 1, "window enrichment must shuffle at most once"
    assert not rep["python_udf"]


def test_dynamic_partition_pruning(spark, sf_small, tmp_path):
    """A hive-partitioned fact joined to a filtered dim must prune fact
    partitions at RUNTIME from the dim's filter (DPP) — at 100 TB this is
    the difference between scanning one year and scanning the decade."""
    from yellowrush_spark_ml_pipeline_spark.sources import write_partitioned_parquet
    from yellowrush_spark_ml_pipeline_spark.sources.readers import read_parquet

    orders = load_table(spark, sf_small, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    write_partitioned_parquet(orders, path, "order_year")
    fact = read_parquet(spark, path)
    years = (
        orders.select("order_year").distinct()
        .withColumn("flag", F.col("order_year") % 2)
    )
    joined = fact.join(years.filter(F.col("flag") == 1), "order_year")
    plan = explain_str(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_pricing_summary_partial_agg(spark, sf_small):
    plan = explain_str(entrymod.q_pricing_summary(spark, sf_small))
    # partial (map-side) + final hash aggregation — the shuffle carries
    # per-group partials, not rows
    assert plan.count("HashAggregate") >= 2, plan
    assert "PushedFilters: [" in plan


def test_narrow_text_embedding_ops_have_zero_exchanges(spark, sf_small):
    """The per-row text/embedding operators (chunking, quantization,
    repetition) must stay shuffle-free narrow maps fused into the scan —
    at 100 TB a stray exchange here re-shuffles the whole corpus."""
    for name in ("chunk_documents", "embedding_quantize", "repetition_score"):
        rep = plan_report(entrymod.queries()[name](spark, sf_small))
        # Zero KEY exchanges: nothing may shuffle the corpus by a key.
        # A single round-robin exchange is permitted — the unsplittable-
        # input scan spread (functions/partitioning.py), which never
        # fires at a scale where the input splits into enough tasks.
        assert rep["key_exchanges"] == 0, f"{name} must not key-shuffle"
        assert rep["exchanges"] <= 1, f"{name} should be a narrow map"
        assert not rep["python_udf"], f"{name} must stay JVM-side"


def test_incremental_dedup_no_corpus_self_join(spark, sf_small):
    """The incremental candidate join must be new-batch x corpus — no
    cartesian products, no broadcast of the (unbounded) corpus side."""
    plan = explain_str(entrymod.queries()["incremental_dedup"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontaminate_broadcasts_benchmark_not_corpus(spark, sf_small):
    """The benchmark-gram side is bounded (an eval set) and must
    broadcast; the corpus side must never be broadcast or nested-loop
    joined."""
    plan = explain_str(entrymod.queries()["decontaminate"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_topk_queries_never_globally_sort(spark, sf_small):
    """vocab/bigram/skew heads must run as TakeOrderedAndProject
    (per-partition top-k, k rows travel) — a global Sort of the exploded
    token relation is the 100 TB failure mode."""
    for name in ("vocab_topk", "bigram_topk", "skew_profile"):
        plan = explain_str(entrymod.queries()[name](spark, sf_small))
        assert "TakeOrderedAndProject" in plan, f"{name}: no top-k pushdown"


def test_funnel_reuses_user_partitioning(spark, sf_small):
    """Each funnel stage joins and re-aggregates on user_id; the events
    relation is re-read per stage (one exchange each), but no stage may
    introduce an EXTRA shuffle between its join and its aggregation."""
    from yellowrush_spark_ml_pipeline_spark.operators import events as events_ops

    ev = load_table(spark, sf_small, "events")
    df = events_ops.funnel_counts(ev, ["view", "click", "purchase"])
    plan = explain_str(df)
    # 3 stage scans + stage-2 and stage-3 joins: every Exchange must be
    # hashpartitioning(user_id) or the final single-partition union agg.
    import re

    exchanges = re.findall(r"Exchange (\w+)\(([^)]*)\)", plan)
    for kind, args in exchanges:
        assert (
            "user_id" in args or "SinglePartition" in kind or "SinglePartition" in args
        ), f"unexpected exchange: {kind}({args})"


def test_funnel_window_scans_events_once(spark, sf_small):
    """The single-shuffle funnel variant's contract: ONE scan of the
    events relation (the S-pass form re-reads it per stage), and the only
    fact-table exchange partitions by user."""
    from yellowrush_spark_ml_pipeline_spark.operators import events as events_ops

    ev = load_table(spark, sf_small, "events")
    plan = explain_str(
        events_ops.funnel_counts_window(ev, ["view", "click", "purchase"])
    )
    assert plan.count("events.parquet") == 1
    assert "_u" in plan  # the per-user aggregation exists


def test_compression_ratio_profile_has_no_join(spark, sf_small):
    """Passthrough columns over the Arrow boundary must make the
    per-language profile join-free: a narrow MapInPandas, one aggregation
    exchange, no join operator anywhere."""
    plan = explain_str(entrymod.q_compression_ratio(spark, sf_small))
    assert "Join" not in plan
    assert "MapInPandas" in plan
    rep = plan_report(entrymod.q_compression_ratio(spark, sf_small))
    # partial-agg exchange + result ordering; +1 allows the round-robin
    # scan spread (functions/partitioning.py), which is key-free
    assert rep["key_exchanges"] <= 2
    assert rep["exchanges"] <= 3


def test_pack_efficiency_no_join_bounded_exchanges(spark, sf_small):
    """The packing audit is window + two hash aggregations — no join, and
    at most 3 exchanges (lang window, (lang,bin) agg, ordered result)."""
    plan = explain_str(entrymod.q_pack_efficiency(spark, sf_small))
    assert "Join" not in plan
    rep = plan_report(entrymod.q_pack_efficiency(spark, sf_small))
    assert rep["exchanges"] <= 3
    assert not rep["python_udf"]


def test_quantile_cutoff_windows_over_histogram_not_table(spark, sf_small):
    """The running-sum window must consume the aggregated per-value
    relation (HashAggregate below the Window), never the raw table."""
    plan = explain_str(entrymod.queries()["quantile_cutoff"](spark, sf_small))
    assert "Window" in plan
    w = plan.index("Window")
    assert "HashAggregate" in plan[w:], "window must sit over the value histogram"


def test_grouped_quantile_no_global_sort(spark, sf_small):
    plan = explain_str(entrymod.queries()["grouped_quantile"](spark, sf_small))
    # partitioned window -> no single-partition exchange anywhere
    assert "SinglePartition" not in plan


def test_corr_moments_single_pass(spark, sf_small):
    """All six moments must come from ONE scan + partial/final agg pair
    (no join of separate aggregations)."""
    df = entrymod.queries()["corr_moments"](spark, sf_small)
    plan = explain_str(df)
    assert "Join" not in plan
    rep = plan_report(df)
    assert rep["exchanges"] == 1  # the single-row final reduce only


def test_event_transitions_bounded_exchanges(spark, sf_small):
    """One user-key window exchange over events + two tiny aggregation/
    window exchanges on the (type x type) relation; no joins."""
    df = entrymod.queries()["event_transitions"](spark, sf_small)
    plan = explain_str(df)
    assert "Join" not in plan
    rep = plan_report(df)
    assert rep["exchanges"] <= 3
    assert not rep["python_udf"]


def test_first_touch_attribution_one_scan_one_events_exchange(spark, sf_small):
    """The min-struct argmin folds first-touch into the conversion
    aggregation: ONE parquet scan, user-key exchange + channel-key
    exchange only."""
    df = entrymod.queries()["first_touch_attribution"](spark, sf_small)
    plan = explain_str(df)
    # one "Location:" detail block == one parquet scan (the tree and the
    # detail section each print the scan node's name, so count Location)
    assert plan.count("Location:") == 1
    rep = plan_report(df)
    assert rep["exchanges"] <= 2
    assert "Join" not in plan


def test_dup_ngram_spans_no_cartesian_hash_keys_only(spark, sf_small):
    """Gram text must never shuffle: the ubiquity semi-join keys on the
    md5 hash; the span merge is one doc-key window. No cartesian, no
    Python."""
    df = entrymod.queries()["dup_ngram_spans"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    rep = plan_report(df)
    assert not rep["python_udf"]


def test_unigram_nll_broadcasts_total_no_python(spark, sf_small):
    """The corpus total must enter as a broadcast (1-row relation), not a
    shuffled join side; all arithmetic JVM-side."""
    df = entrymod.queries()["unigram_nll"](spark, sf_small)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    rep = plan_report(df)
    assert not rep["python_udf"]


def test_fuzzy_join_no_cartesian_bounded_verify(spark, sf_small):
    """The ER join must run on block keys (hash join on 8-char blocks),
    never as a quadratic nested loop; the levenshtein verify stays in
    codegen (no Python)."""
    df = entrymod.queries()["fuzzy_join"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rep = plan_report(df)
    assert not rep["python_udf"]


def test_max_concurrency_single_events_exchange(spark, sf_small):
    """All three windows (running sum, per-key max, argmin group-by)
    share the event_type key — Catalyst must plan ONE exchange for the
    delta relation, plus nothing else."""
    df = entrymod.queries()["max_concurrency"](spark, sf_small)
    plan = explain_str(df)
    assert "Join" not in plan
    rep = plan_report(df)
    assert rep["exchanges"] <= 2  # union-delta exchange (+ final tiny agg)
    assert not rep["python_udf"]


def test_rollup_merge_partial_states_then_one_merge(spark, sf_small):
    """Each half aggregates with map-side combine, the merge re-groups on
    the same key: bounded exchanges, no joins, no Python."""
    df = entrymod.queries()["rollup_merge"](spark, sf_small)
    plan = explain_str(df)
    assert "Join" not in plan
    rep = plan_report(df)
    assert rep["exchanges"] <= 3
    assert not rep["python_udf"]


def test_weighted_sample_takeordered_no_global_sort(spark, sf_small):
    """Top-k by priority must plan as TakeOrderedAndProject — a global
    Sort of the corpus would be the 100 TB scale-killer here."""
    df = entrymod.queries()["weighted_sample"](spark, sf_small)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan
    rep = plan_report(df)
    assert rep["exchanges"] == 0
    assert not rep["python_udf"]


def test_shipping_priority_pushdown_and_topk(spark, sf_small):
    """Q3 shape: segment/date filters reach the scans, the head is
    TakeOrderedAndProject, revenue aggregation is partial+final."""
    df = entrymod.queries()["shipping_priority"](spark, sf_small)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan
    rep = plan_report(df)
    assert rep["pushed_filters"]
    assert not rep["python_udf"]


def test_rrf_fusion_joins_only_topk_lists(spark, sf_small):
    """The fusion join runs on per-query-bounded top-N lists; the only
    corpus-wide work is the two broadcast-query scoring passes."""
    df = entrymod.queries()["rrf_fusion"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    rep = plan_report(df)
    assert not rep["python_udf"]


def test_bm25_broadcasts_stats_takeordered_head(spark, sf_small):
    """df/avgdl enter as broadcasts; the head is TakeOrderedAndProject;
    no Python anywhere."""
    df = entrymod.queries()["bm25_topk"](spark, sf_small)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    rep = plan_report(df)
    assert not rep["python_udf"]


def test_session_stats_single_user_exchange(spark, sf_small):
    """Sessionize windows + the session aggregation all key on user_id:
    ONE events exchange, no joins."""
    df = entrymod.queries()["session_stats"](spark, sf_small)
    plan = explain_str(df)
    assert "Join" not in plan
    rep = plan_report(df)
    assert rep["exchanges"] <= 1
    assert not rep["python_udf"]


def test_source_overlap_broadcast_totals_no_doc_quadratic(spark, sf_small):
    """The gram self-join must be an equi-join on the gram key (hash
    join), totals enter broadcast; nothing quadratic in documents."""
    df = entrymod.queries()["source_overlap"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    rep = plan_report(df)
    assert not rep["python_udf"]


def test_order_skyline_global_window_after_local_prune(spark, sf_small):
    """Two-level skyline: the parallel bucket window precedes the
    single-partition global window, so the global exchange only ever
    carries local-skyline survivors."""
    df = entrymod.queries()["order_skyline"](spark, sf_small)
    plan = explain_str(df)
    # bucket pass (hashpartitioning on _b) must appear BEFORE the
    # SinglePartition exchange in the plan text
    bucket_pos = plan.find("hashpartitioning(_b")
    single_pos = plan.find("SinglePartition")
    assert bucket_pos != -1 and single_pos != -1
    rep = plan_report(df)
    assert not rep["python_udf"]


def test_returned_customers_pushdown_broadcast_topk(spark, sf_small):
    df = entrymod.queries()["returned_customers"](spark, sf_small)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan
    rep = plan_report(df)
    assert rep["pushed_filters"]
    assert not rep["python_udf"]


def test_conversion_lag_single_events_exchange(spark, sf_small):
    """Both first-touch timestamps come from ONE conditional aggregation:
    a single events exchange plus the tiny bucket group-by; no joins."""
    df = entrymod.queries()["conversion_lag"](spark, sf_small)
    plan = explain_str(df)
    assert "Join" not in plan
    rep = plan_report(df)
    assert rep["exchanges"] <= 2
    assert not rep["python_udf"]


def test_ngram_novelty_hash_keys_only_no_cartesian(spark, sf_small):
    """Gram text never shuffles — the first-seer aggregation and the
    join-back both key on the 8-byte md5 hash."""
    df = entrymod.queries()["ngram_novelty"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    rep = plan_report(df)
    assert not rep["python_udf"]


def test_table_checksum_single_combinable_aggregation(spark, sf_small):
    """One scan, one partial+final aggregation on the group key — the
    O(|groups|) parity audit must never join or sort."""
    df = entrymod.queries()["table_checksum"](spark, sf_small)
    plan = explain_str(df)
    assert "Join" not in plan and "Sort" not in plan
    rep = plan_report(df)
    assert rep["exchanges"] <= 1
    assert not rep["python_udf"]


def test_top_paths_two_exchanges_toap_head(spark, sf_small):
    """Sessionize and the per-session path aggregation share the user_id
    partitioning (one events exchange); the path count adds one more;
    the head is TakeOrderedAndProject, never a global sort."""
    df = entrymod.queries()["top_paths"](spark, sf_small)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan
    rep = plan_report(df)
    assert rep["exchanges"] <= 2
    assert not rep["python_udf"]


def test_co_visitation_no_cartesian_bounded_exchanges(spark, sf_small):
    """The pair self-join keys on (user, session) — never a cartesian —
    and the distinct collapses BEFORE the join so the fan-out is bounded
    by the per-session type alphabet."""
    df = entrymod.queries()["co_visitation"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    rep = plan_report(df)
    assert rep["exchanges"] <= 4
    assert not rep["python_udf"]


def test_source_kl_drift_no_python_no_cartesian(spark, sf_small):
    """Integer-nanonat KL: pure column expressions (zero Python UDFs);
    the only cross join is the broadcast 1-row corpus total."""
    df = entrymod.queries()["source_kl_drift"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan  # 1-row total enters broadcast
    rep = plan_report(df)
    assert not rep["python_udf"]
    assert rep["broadcast_join"]


def test_pagerank_persisted_graph_no_cartesian(spark, sf_small):
    """The unrolled 3-round plan must reuse the persisted edge/degree
    relations instead of re-deriving the trade graph per round (49 -> 21
    exchanges measured), and the rank join must never go cartesian."""
    df = entrymod.queries()["pagerank"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    rep = plan_report(df)
    assert rep["exchanges"] <= 24
    assert not rep["python_udf"]


def test_kmeans_lloyd_zero_shuffle_assignment(spark, sf_small):
    """Three assignment rounds + two decimal-exact updates: the ONLY
    exchanges are the tiny (cid, dim) update aggregations — assignment
    itself is a broadcast-array narrow map (6 exchanges total), with no
    cartesian and no Python."""
    df = entrymod.queries()["kmeans_lloyd"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    rep = plan_report(df)
    assert rep["exchanges"] <= 7
    assert not rep["python_udf"]


def test_triangles_no_cartesian_key_joins_only(spark, sf_small):
    """Degree-ordered orientation: the wedge and closing joins key on
    node ids — never cartesian — with a TakeOrderedAndProject head."""
    df = entrymod.queries()["triangles"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    rep = plan_report(df)
    assert rep["exchanges"] <= 12  # persisted canon/oriented: 32 -> 10
    assert not rep["python_udf"]


def test_containment_posting_join_no_cartesian(spark, sf_small):
    """Candidate generation must be the df-capped posting-list self-join
    on md5 gram keys — never all-pairs/cartesian — and verification runs
    once per distinct candidate pair."""
    df = entrymod.queries()["containment"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    rep = plan_report(df)
    assert not rep["python_udf"]


def test_linear_attribution_single_user_exchange(spark, sf_small):
    """Full-size event movement only twice (conversion agg + touch
    distinct); the conversion vector joins back broadcast, and the tail
    operates on the bounded touch relation."""
    df = entrymod.queries()["linear_attribution"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    rep = plan_report(df)
    assert rep["exchanges"] <= 7
    assert not rep["python_udf"]


def test_ppr_persisted_graph_no_cartesian(spark, sf_small):
    df = entrymod.queries()["pagerank_personalized"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    rep = plan_report(df)
    assert rep["exchanges"] <= 28
    assert not rep["python_udf"]


def test_local_supplier_volume_pushdown_broadcast_dims(spark, sf_small):
    """Q5 shape: date filter pushed to the orders scan, region/nation
    pinned broadcast, no cartesian."""
    df = entrymod.queries()["local_supplier_volume"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    rep = plan_report(df)
    assert rep["pushed_filters"]
    assert rep["broadcast_join"]
    assert not rep["python_udf"]


def test_trade_volume_single_fact_shuffle_broadcast_nations(spark, sf_small):
    """Q7 shape: both nation lookups broadcast; the fact-side joins and
    the |nations|^2 x years aggregation bound the exchanges."""
    df = entrymod.queries()["trade_volume"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    rep = plan_report(df)
    assert rep["broadcast_join"]
    assert not rep["python_udf"]


def test_k_core_no_cartesian_no_python(spark, sf_small):
    """Peel rounds are degree counts + semi-joins on node ids; rounds
    are localCheckpoint-truncated so plan size stays linear in rounds
    (unpruned it grows ~3^rounds and OOMs the driver)."""
    df = entrymod.queries()["k_core"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    rep = plan_report(df)
    assert not rep["python_udf"]


def test_customer_distribution_outer_join_double_agg(spark, sf_small):
    """Q13 shape: zero-order customers survive the left join; both
    aggregations partial-combine; no cartesian."""
    df = entrymod.queries()["customer_distribution"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    rep = plan_report(df)
    assert not rep["python_udf"]


def _no_cartesian(plan: str) -> bool:
    return "CartesianProduct" not in plan


def _detail_count(plan: str, op: str) -> int:
    return len(re.findall(rf"\(\d+\) {op}\b", plan))


def test_round5_tpch_shapes_scale_contract(spark, sf_small):
    """The round-5 TPC-H shapes must keep dims broadcast, never go
    cartesian, and keep Python out of the hot path."""
    for name in (
        "min_cost_supplier",
        "important_stock",
        "promo_revenue_share",
        "large_volume_customers",
        "market_share",
        "product_profit",
    ):
        rep = plan_report(entrymod.queries()[name](spark, sf_small))
        assert not rep["python_udf"], name
        plan = explain_str(entrymod.queries()[name](spark, sf_small))
        assert _no_cartesian(plan), name
    plan = explain_str(entrymod.queries()["min_cost_supplier"](spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_waiting_suppliers_single_window_pass(spark, sf_small):
    """Q21's EXISTS/NOT-EXISTS pair must stay ONE sorted window over the
    per-(order,supplier) aggregate — a second window or join-back here
    doubles the shuffle bill at 100 TB."""
    plan = explain_str(entrymod.queries()["waiting_suppliers"](spark, sf_small))
    assert _detail_count(plan, "Window") == 1, plan


def test_line_dedup_skew_resilient_shape(spark, sf_small):
    """Segment dedup must count frequencies with a combinable groupBy
    joined back (AQE-skew-splittable on the hot segments C4 exists to
    remove) — NOT a window over seg_text, which would pin every copy of
    a viral segment into one partition."""
    rep = plan_report(entrymod.queries()["line_dedup"](spark, sf_small))
    assert not rep["python_udf"]
    plan = explain_str(entrymod.queries()["line_dedup"](spark, sf_small))
    assert _detail_count(plan, "Window") == 0, plan
    assert "CartesianProduct" not in plan
    # partial (map-side) aggregation on the frequency count
    assert _detail_count(plan, "HashAggregate") >= 2, plan


def test_single_scan_profiling_ops(spark, sf_small):
    """filter_funnel / benford / column_entropy are single-scan
    conditional aggregations — no fact-table self-joins, no Python,
    no cartesian blowups (the one-row-total cross joins must plan as
    broadcast)."""
    for name in ("filter_funnel", "benford", "column_entropy"):
        rep = plan_report(entrymod.queries()[name](spark, sf_small))
        assert not rep["python_udf"], name
        plan = explain_str(entrymod.queries()[name](spark, sf_small))
        assert _no_cartesian(plan), name
        assert _detail_count(plan, "Scan parquet") <= 2, name


def test_winnow_pairs_posting_join_no_cartesian(spark, sf_small):
    """Winnowing pair generation must be the df-capped posting-list
    self-join on fingerprint hashes — never all-pairs."""
    df = entrymod.queries()["winnow_pairs"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    rep = plan_report(df)
    assert rep["exchanges"] <= 14  # checkpointed fingerprints: 28 -> 12
    assert not rep["python_udf"]


def test_tfidf_pairs_posting_join_no_cartesian(spark, sf_small):
    """Sparse TF-IDF scoring: rare-term posting candidates + id-keyed
    verify joins; the only crossJoin is the broadcast 1-row N."""
    df = entrymod.queries()["tfidf_pairs"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    rep = plan_report(df)
    assert not rep["python_udf"]


def test_label_propagation_bounded_plan(spark, sf_small):
    """Per-round labels relation is checkpointed, so the visible plan is
    one round: join + count + top-1 window, no cartesian."""
    df = entrymod.queries()["label_propagation"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    rep = plan_report(df)
    assert rep["exchanges"] <= 6
    assert not rep["python_udf"]


def test_cms_sketch_combinable_aggs(spark, sf_small):
    """CMS build and truth are combinable hash aggregations with a
    broadcast probe join — no sort of the fact side before aggregation."""
    df = entrymod.queries()["cms_heavy_hitters"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    rep = plan_report(df)
    assert rep["exchanges"] <= 8
    assert not rep["python_udf"]


def test_bpe_merges_dictionary_rounds(spark, sf_small):
    """BPE rounds operate on the checkpointed word dictionary: the final
    visible plan is unions of 1-row TakeOrdered tops — no cartesian, no
    Python in the data path."""
    df = entrymod.queries()["bpe_merges"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    rep = plan_report(df)
    assert not rep["python_udf"]


def test_dq_report_one_scan_per_fact_table(spark, sf_small):
    """Round-9 contract (supersedes the r7 full fusion, refuted by the
    measured crossover probe — tools/dq_crossover.py): COLUMN checks
    fuse into one scan per fact table, but FK-orphan checks are
    LEFT-ANTI joins with NO broadcast hint — the r7 shape broadcast the
    parent's distinct keys into the fact scan, and orders/customer are
    FACT-sized parents whose key sets grow with the data (unbounded
    broadcast build at 100 TB). Pinned here: lineitem scanned at most
    twice (fused column checks + key-only orphan probe), the orphan
    checks plan as LeftAnti joins, the anti-join side scans ONLY the
    key column (column pruning reaches the scan), seven scans total,
    and no forced-broadcast regression can reintroduce the hazard
    because the anti-joins must survive with AQE free to pick the
    strategy."""
    df = entrymod.queries()["dq_report"](spark, sf_small)
    plan = explain_str(df)
    scans = re.findall(
        r"\(\d+\) Scan parquet\s*\nOutput \[\d+\]: \[([^\]]*)\]", plan
    )
    li_scans = [s for s in scans if "l_orderkey" in s]
    o_scans = [s for s in scans if "o_orderkey" in s or "o_custkey" in s]
    assert len(li_scans) <= 2, f"lineitem scanned too often: {scans}"
    # the orphan-probe lineitem scan must be key-only (pruned)
    key_only = [s for s in li_scans if "l_quantity" not in s]
    assert key_only, f"anti-join scan must prune to the key: {li_scans}"
    assert len(o_scans) <= 3, f"orders scanned too often: {scans}"
    assert len(scans) <= 7, f"too many scans: {scans}"
    assert "LeftAnti" in plan, "FK orphan checks must be anti-joins"
    assert _no_cartesian(plan)


def test_quantile_state_merge_bounded_plan(spark, sf_small):
    """Round-8 mergeable-quantile contract: the raw events relation is
    touched only by combinable hash aggregations (state build — one
    shuffle per half on the key, map-side partials over a
    |keys| x (n_bins+2) space); everything after the merge operates on
    STATE-sized relations, so the cumulative-rank window partitions by
    key over at most n_bins+2 rows each and the only cross join is the
    broadcast 3-row percentile list. No python, no cartesian, no global
    sort of anything data-sized."""
    df = entrymod.queries()["quantile_state_merge"](spark, sf_small)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    rep = plan_report(df)
    assert not rep["python_udf"]
    # broadcast percentile probe, never a shuffled join of ps
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ml_classifier_metrics_reads_only_persisted_artifact(spark, sf_small):
    """Round-8 contract (r7 rf_train_sec doubled with no code change —
    pin the mechanism): EVERY metric in the oracle-checkable classifier
    eval derives from the ONE persisted predictions artifact. The
    returned plan's parquet scans must all point at the predcache
    artifact (confusion pass + rank pass = at most 2 scans of a tiny
    relation) and must NOT reach the training tables — i.e. the model
    transform is materialized exactly once, at artifact-write time,
    never re-entered by the metric derivation."""
    df = entrymod.queries()["ml_classifier_metrics"](spark, sf_small)
    plan = explain_str(df)
    locs = re.findall(r"Location: \S+ ?\[([^\]]*)\]", plan)
    assert locs, plan
    assert all("predcache" in loc for loc in locs), locs
    assert len(locs) <= 2, locs
    rep = plan_report(df)
    assert not rep["python_udf"]


def _tree_nodes(plan_str: str):
    """Parse a physical-plan toString() tree into (depth, text) nodes.
    Depth is the character offset of the operator name — children are
    strictly deeper than their parent and appear after it."""
    nodes = []
    for line in plan_str.splitlines():
        if not line.strip() or line.lstrip().startswith("=="):
            continue
        m = re.search(r"[A-Za-z]", line)
        if not m:
            continue
        nodes.append((m.start(), line[m.start():].strip()))
    return nodes


def _unbounded_single_partition_windows(plan_str: str) -> list[str]:
    """Return violations: single-partition Window ops whose subtree
    reaches a parquet scan WITHOUT passing through a bounding operator
    (aggregate / limit / window-group-limit) — i.e. an all-rows sort of
    an unbounded relation. The bounded-window contract says every
    unpartitioned window must consume a pre-aggregated or limited
    relation, never the fact table."""
    nodes = _tree_nodes(plan_str)
    bounding = ("HashAggregate", "SortAggregate", "ObjectHashAggregate",
                "GlobalLimit", "LocalLimit", "WindowGroupLimit",
                "TakeOrderedAndProject", "BroadcastNestedLoopJoin")
    bad = []
    for i, (d, text) in enumerate(nodes):
        if not text.startswith("Window"):
            continue
        # subtree: following nodes strictly deeper than the window node
        j = i + 1
        saw_single = False
        # walk the subtree; a scan is OK once ANY bounding op lies on the
        # path above it.  Track the minimum-depth bounding ops seen so
        # far: a scan at depth ds is covered if some bounding ancestor
        # with depth < ds appeared earlier in the walk.
        bound_depths: list[int] = []
        while j < len(nodes) and nodes[j][0] > d:
            dd, tt = nodes[j][0], nodes[j][1]
            bound_depths = [b for b in bound_depths if b < dd] + (
                [dd] if tt.startswith(bounding) else []
            )
            if "Exchange SinglePartition" in tt:
                saw_single = True
            if tt.startswith("Scan parquet") or "FileScan" in tt:
                if saw_single and not any(b < dd for b in bound_depths):
                    bad.append(text[:80])
                    break
            j += 1
    return bad


def test_bounded_window_contract_for_global_order_family(spark, sf_small):
    """quality_buckets / theil_sen / lttb_downsample / quantile_cutoff
    use unpartitioned Window.orderBy — legal ONLY because the window
    input is a pre-aggregated (or limited) relation, never the raw fact
    table. This pins that docstring promise mechanically: any
    single-partition window whose subtree reaches a parquet scan without
    an intervening aggregate/limit fails."""
    for name in ("quality_buckets", "theil_sen", "lttb_downsample",
                 "quantile_cutoff"):
        df = entrymod.queries()[name](spark, sf_small)
        plan = df._jdf.queryExecution().executedPlan().toString()
        bad = _unbounded_single_partition_windows(plan)
        assert not bad, f"{name}: unbounded single-partition window: {bad}"
