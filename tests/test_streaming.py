"""True Structured Streaming execution (SURVEY.md §2.12 extension surface):
the SAME windowed-aggregation code that the batch oracle checks, run as a
readStream → watermark → writeStream job against a file source, must
produce the batch answer. Round 1 shipped streaming_window_agg without
ever starting a stream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yellowrush_spark_ml_pipeline_spark.sources import load_table
from yellowrush_spark_ml_pipeline_spark.streaming import (
    stream_to_parquet,
    streaming_dedup,
    streaming_enrich,
    streaming_user_totals,
    streaming_window_agg,
)


def test_streaming_window_agg_matches_batch(spark, sf_small, tmp_path):
    events = load_table(spark, sf_small, "events")
    src = str(tmp_path / "events_stream_src")
    # re-land the fixture as a clean µs-timestamp parquet (older fixture
    # generations were TIMESTAMP(NANOS), which a streaming schema can't
    # declare directly — re-landing is generation-proof)
    events.write.mode("overwrite").parquet(src)

    stream_df = streaming_window_agg(
        spark,
        src,
        events.schema,
        ts_col="ts",
        duration="1 hour",
        watermark="30 minutes",
        keys=("event_type",),
        value_col="value",
    )
    assert stream_df.isStreaming

    query = (
        stream_df.writeStream.format("memory")
        .queryName("win_agg_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(120)
    finally:
        query.stop()

    got = {
        (r.window_start, r.event_type): (r.event_count, round(r.value_sum, 4))
        for r in spark.sql("SELECT * FROM win_agg_test").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.event_count, round(r.value_sum, 4))
        for r in (
            events.groupBy(
                F.window("ts", "1 hour").alias("w"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("event_count"),
                F.sum("value").alias("value_sum"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "event_count",
                "value_sum",
            )
        ).collect()
    }
    assert got == want
    assert len(got) > 50  # real window spread, not a degenerate single bucket


def test_streaming_dedup_across_batches(spark, sf_small, tmp_path):
    """Cross-batch dedup: the same fingerprint landing in a LATER
    micro-batch must be suppressed by state, not re-emitted."""
    from yellowrush_spark_ml_pipeline_spark.functions.text import rolling_fingerprint

    docs = (
        load_table(spark, sf_small, "documents")
        .filter(F.col("doc_id") < 60)
        .select(
            "doc_id",
            rolling_fingerprint(F.col("text")).alias("fp"),
            F.to_timestamp(F.lit("2024-01-01 12:00:00")).alias("ts"),
        )
    )
    dup_batch = docs.filter(F.col("doc_id") < 30)  # re-send first 30 later
    src = str(tmp_path / "dedup_stream")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    dup_batch.coalesce(1).write.mode("append").parquet(src)

    stream_df = streaming_dedup(
        spark,
        src,
        spark.read.parquet(src).schema,
        dedup_cols=["fp"],
        ts_col="ts",
        watermark="1 hour",
    )
    query = (
        stream_df.writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(120)
    finally:
        query.stop()

    out = spark.sql("SELECT fp, count(*) AS n FROM dedup_stream_test GROUP BY fp").collect()
    assert len(out) == 60  # every distinct fingerprint exactly once
    assert all(r.n == 1 for r in out), "cross-batch duplicate leaked through"


def test_stream_static_enrichment_matches_batch_join(spark, sf_small, tmp_path):
    """Stream-static join: streamed events enriched with a static user
    dim must equal the batch broadcast join, including left-join nulls."""
    events = load_table(spark, sf_small, "events").select("event_id", "user_id", "value")
    src = str(tmp_path / "enrich_src")
    events.coalesce(2).write.mode("overwrite").parquet(src)
    # static dim covering only even user ids → odd ones exercise the left-null path
    dim = (
        events.select("user_id").distinct()
        .filter(F.col("user_id") % 2 == 0)
        .withColumn("tier", F.when(F.col("user_id") % 4 == 0, "gold").otherwise("basic"))
    )
    stream_df = streaming_enrich(
        spark, src, spark.read.parquet(src).schema, dim, on="user_id"
    )
    assert stream_df.isStreaming
    query = (
        stream_df.writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(120)
    finally:
        query.stop()
    got = {
        (r.event_id): (r.user_id, r.tier)
        for r in spark.sql("SELECT * FROM enrich_test").collect()
    }
    want = {
        r.event_id: (r.user_id, r.tier)
        for r in events.join(dim, "user_id", "left").collect()
    }
    assert got == want
    assert any(t is None for _, t in got.values())  # left-null path exercised


def test_stream_to_parquet_foreachbatch_sink(spark, sf_small, tmp_path):
    """foreachBatch sink: streamed source lands as (transformed,
    partitioned) parquet equal to the batch computation, with a
    checkpoint directory committed per epoch."""
    import pathlib

    events = load_table(spark, sf_small, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "sink_src")
    events.coalesce(2).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    query = stream_to_parquet(
        stream,
        out,
        ckpt,
        partition_cols=["event_type"],
        transform=lambda df: df.withColumn("value2", F.col("value") * 2),
    )
    try:
        query.awaitTermination(120)
    finally:
        query.stop()

    back = spark.read.parquet(out)
    assert back.count() == events.count()
    assert set(back.columns) == {"event_id", "user_id", "event_type", "value", "value2"}
    s = back.agg(F.sum("value2")).first()[0]
    want = events.agg(F.sum("value") * 2).first()[0]
    assert abs(s - want) < 1e-6
    # hive layout + committed checkpoint epochs
    assert any(p.name.startswith("event_type=") for p in pathlib.Path(out).iterdir())
    assert (pathlib.Path(ckpt) / "commits").exists()


def test_stream_restart_resumes_from_checkpoint(spark, sf_small, tmp_path):
    """Checkpoint recovery — the property a 100 TB ingest depends on:
    a stopped stream restarted with the same checkpoint processes ONLY
    data that arrived since, and the combined output is each input row
    exactly once (no replays of wave 1, no loss of wave 2)."""
    from pyspark.sql.types import StructType

    events = load_table(spark, sf_small, "events").select("event_id", "user_id", "ts")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    wave1 = events.filter(F.col("event_id") % 2 == 0)
    wave2 = events.filter(F.col("event_id") % 2 == 1)
    wave1.write.mode("append").parquet(src)

    schema = StructType.fromJson(events.schema.jsonValue())

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(src)
        )
        q = stream_to_parquet(stream, out, ckpt)
        q.awaitTermination(120)
        q.stop()

    run_once()
    n_after_wave1 = spark.read.parquet(out).count()
    assert n_after_wave1 == wave1.count()

    wave2.write.mode("append").parquet(src)
    run_once()  # same checkpoint: must pick up ONLY wave 2
    final = spark.read.parquet(out)
    assert final.count() == events.count()
    # exactly-once: every event_id appears once across both runs
    assert final.select("event_id").distinct().count() == events.count()


def test_stateful_user_totals_accumulate_across_batches(spark, sf_small, tmp_path):
    """applyInPandasWithState: per-key state must survive micro-batch
    boundaries — the file source is split in two so every user's total is
    built from at least two state updates."""
    events = load_table(spark, sf_small, "events").select("user_id", "value")
    src = str(tmp_path / "events_two_files")
    first, second = events.randomSplit([0.5, 0.5], seed=42)
    first.coalesce(1).write.mode("overwrite").parquet(src)
    second.coalesce(1).write.mode("append").parquet(src)

    stream_df = streaming_user_totals(
        spark,
        src,
        spark.read.parquet(src).schema,
        max_files_per_trigger=1,  # forces >=2 micro-batches
    )
    assert stream_df.isStreaming
    query = (
        stream_df.writeStream.format("memory")
        .queryName("user_totals_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(120)
    finally:
        query.stop()

    updates = spark.sql("SELECT * FROM user_totals_test").collect()
    # final state per user = the row with the max event_count
    final: dict[int, tuple[int, float]] = {}
    for r in updates:
        if r.user_id not in final or r.event_count > final[r.user_id][0]:
            final[r.user_id] = (r.event_count, r.value_sum)
    want = {
        r.user_id: (r.cnt, r.total)
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("total"),
        )
        .collect()
    }
    assert set(final) == set(want)
    for uid, (cnt, total) in want.items():
        got_cnt, got_total = final[uid]
        assert got_cnt == cnt, (uid, got_cnt, cnt)
        assert abs(got_total - total) < 1e-6 * max(1.0, abs(total))
    # state genuinely crossed batches: more update rows than users
    assert len(updates) > len(want)


def test_stream_stream_interval_join_matches_batch(spark, sf_small, tmp_path):
    from yellowrush_spark_ml_pipeline_spark.streaming.stateful import (
        streaming_interval_join,
    )

    events = load_table(spark, sf_small, "events")
    src = str(tmp_path / "ssj_src")
    events.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    joined = streaming_interval_join(
        spark,
        src,
        src,
        schema,
        left_type="click",
        right_type="purchase",
        max_delay="1 hour",
    )
    assert joined.isStreaming
    query = (
        joined.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(180)
    finally:
        query.stop()

    got = {
        (r.user_id, r.l_ts, r.r_ts)
        for r in spark.sql("SELECT * FROM ssj_test").collect()
    }
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("l_ts")
    )
    buys = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts")
    )
    want = {
        (r.user_id, r.l_ts, r.r_ts)
        for r in clicks.join(
            buys,
            (F.col("user_id") == F.col("r_user"))
            & (F.col("r_ts") > F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 hour")),
        ).collect()
    }
    assert len(want) > 0
    assert got == want


def test_watermark_drops_late_rows_across_restarts(spark, tmp_path):
    """Append-mode watermark semantics across checkpointed incremental
    runs — the part no batch-equivalence test can see: a row arriving in
    a later run BEHIND the restored watermark (its window already
    finalized) is dropped, each finalized window emits exactly once, and
    a batch replay of the same files would have counted the late row —
    the difference IS the drop.

    (Within a single availableNow run Spark applies the late-record
    filter with the watermark of the previous *run*, so the drop is only
    observable across restarts — which is also the production shape for
    incremental ingest.)"""
    import os
    from datetime import datetime

    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("ts", TimestampType(), True),
            StructField("event_type", StringType(), True),
            StructField("value", DoubleType(), True),
        ]
    )
    src = str(tmp_path / "late_src")
    out = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")

    def land(rows, mode):
        spark.createDataFrame(
            [
                (datetime.strptime(r[0], "%Y-%m-%d %H:%M:%S"), r[1], 1.0)
                for r in rows
            ],
            schema=schema,
        ).coalesce(1).write.mode(mode).parquet(src)

    def run():
        stream_df = streaming_window_agg(
            spark,
            src,
            schema,
            ts_col="ts",
            duration="15 minutes",
            watermark="30 minutes",
            keys=("event_type",),
            value_col="value",
        )
        query = (
            stream_df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            query.awaitTermination(120)
        finally:
            query.stop()

    # run 1: two rows in the 10:00 window + a sentinel driving the
    # watermark to 13:30 (event-time max 14:00 - 30 min delay)
    land(
        [
            ("2024-01-01 10:00:00", "a"),
            ("2024-01-01 10:05:00", "a"),
            ("2024-01-01 14:00:00", "sent"),
        ],
        "overwrite",
    )
    run()
    # run 2: a LATE duplicate for the long-finalized 10:00 window plus a
    # sentinel raising the watermark further so 14:00's window flushes
    land([("2024-01-01 10:05:00", "a"), ("2024-01-01 15:00:00", "sent")], "append")
    run()
    # run 3: one more sentinel so 15:00's window flushes as well
    land([("2024-01-01 16:00:00", "sent")], "append")
    run()

    got = {
        (str(r.window_start), r.event_type): r.event_count
        for r in spark.read.parquet(out).collect()
    }
    n_rows = spark.read.parquet(out).count()
    assert n_rows == len(got), "a finalized window emitted more than once"
    # the late 10:05 duplicate was dropped: count stays 2 (batch says 3)
    assert got.get(("2024-01-01 10:00:00", "a")) == 2
    assert got.get(("2024-01-01 14:00:00", "sent")) == 1
    assert got.get(("2024-01-01 15:00:00", "sent")) == 1
    # the final sentinel's window never crossed the watermark -> unflushed
    assert ("2024-01-01 16:00:00", "sent") not in got
    assert os.path.isdir(ckpt)


def test_streaming_transitions_match_batch_lag(spark, sf_small, tmp_path):
    """streaming_transitions must reproduce the batch lag-window
    transition multiset exactly, with the file source split on event time
    so cross-batch boundary transitions are stitched from state (ordered
    arrival per user — the operator's documented contract)."""
    from yellowrush_spark_ml_pipeline_spark.operators.events import (
        event_transitions,
    )
    from yellowrush_spark_ml_pipeline_spark.streaming.stateful import (
        streaming_transitions,
    )

    events = load_table(spark, sf_small, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    cut = events.agg(
        F.expr("percentile_approx(ts, 0.5)").alias("m")
    ).collect()[0].m
    src = str(tmp_path / "events_time_split")
    events.filter(F.col("ts") <= cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    events.filter(F.col("ts") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream_df = streaming_transitions(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    assert stream_df.isStreaming
    query = (
        stream_df.writeStream.format("memory")
        .queryName("transitions_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(120)
    finally:
        query.stop()

    got = {
        (r.prev_type, r.next_type): r.n
        for r in spark.sql(
            "SELECT prev_type, next_type, COUNT(*) AS n"
            " FROM transitions_test GROUP BY 1, 2"
        ).collect()
    }
    want = {
        (r.prev_type, r.next_type): r.n_transitions
        for r in event_transitions(events).collect()
    }
    assert got == want
    # boundary stitching actually happened: at least one user has events
    # on both sides of the cut
    both = (
        events.filter(F.col("ts") <= cut)
        .select("user_id")
        .intersect(events.filter(F.col("ts") > cut).select("user_id"))
        .count()
    )
    assert both > 0


def test_streaming_near_dup_candidates_across_batches(spark, sf_small, tmp_path):
    """The state-held LSH buckets must pair a near-duplicate arriving in a
    LATER micro-batch with its original from an EARLIER one — the
    incremental-dedup contract, streaming. Planted tail-suffix copies of
    the first 10 docs arrive in batch 2."""
    from yellowrush_spark_ml_pipeline_spark.streaming.stateful import (
        streaming_near_dup_candidates,
    )

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    src = str(tmp_path / "docs_two_batches")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    copies.coalesce(1).write.mode("append").parquet(src)

    stream_df = streaming_near_dup_candidates(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    assert stream_df.isStreaming
    query = (
        stream_df.writeStream.format("memory")
        .queryName("near_dup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(180)
    finally:
        query.stop()

    pairs = {
        (r.id_a, r.id_b)
        for r in spark.sql(
            "SELECT DISTINCT id_a, id_b FROM near_dup_test"
        ).collect()
    }
    # every planted copy must be paired with its original (same minhash
    # band with overwhelming probability at jaccard ~0.97)
    found = sum((d, d + 900000) in pairs for d in range(10))
    assert found >= 9, f"only {found}/10 planted cross-batch pairs found"
    # and unrelated docs must NOT be wholesale paired (banding prunes)
    assert len(pairs) < 200, len(pairs)


def test_streaming_quantile_state_maintenance_matches_batch(spark, sf_small, tmp_path):
    """Round 8: the mergeable-quantile story end to end on a STREAM —
    each micro-batch collapses to fixed-edge histogram state via
    foreachBatch, states merge incrementally into a running table, and
    the final merged state (and the percentiles derived from it) must
    equal a from-scratch batch computation over all events. This is the
    daily-rollup shape at 100 TB: per-ingest state build + integer
    merge, never a corpus replay."""
    from yellowrush_spark_ml_pipeline_spark.operators import sketches

    events = load_table(spark, sf_small, "events").select(
        "event_type", "value"
    )
    src = str(tmp_path / "qs_src")
    events.coalesce(3).write.mode("overwrite").parquet(src)

    kw = dict(keys=["event_type"], val_col="value", lo=0.0, hi=512.0, n_bins=64)
    acc: dict[str, object] = {"state": None}

    def merge_batch(batch_df, _epoch):
        st = sketches.quantile_state(batch_df, **kw)
        prev = acc["state"]
        if prev is None:
            acc["state"] = st.localCheckpoint(eager=True)
        else:
            acc["state"] = sketches.merge_quantile_states(
                prev, st
            ).localCheckpoint(eager=True)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "qs_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    got = sorted(
        sketches.quantile_from_state(
            acc["state"], ["event_type"], ps=(0.5, 0.95), lo=0.0, hi=512.0
        ).collect(),
        key=lambda r: (r["event_type"], r["p"]),
    )
    want = sorted(
        sketches.quantile_from_state(
            sketches.quantile_state(events, **kw),
            ["event_type"], ps=(0.5, 0.95), lo=0.0, hi=512.0,
        ).collect(),
        key=lambda r: (r["event_type"], r["p"]),
    )
    assert got == want and len(got) > 0


def test_streaming_semantic_dedup_across_batches(spark, sf_small, tmp_path):
    """Round 11: the embedding-tier stateful member — cluster-keyed
    state must prune a collinear copy arriving in a LATER micro-batch
    against its batch-1 original (cross-batch incumbent-wins), keep
    fresh docs, and report the claiming incumbent."""
    from yellowrush_spark_ml_pipeline_spark.operators import similarity
    from yellowrush_spark_ml_pipeline_spark.streaming.stateful import (
        streaming_semantic_dedup,
    )

    emb = load_table(spark, sf_small, "embeddings").select(
        "vec_id", "embedding"
    )
    base = emb.filter(F.col("vec_id") < 200)
    _, cents = similarity.semantic_dedup_build(base, threshold=0.9999, k="auto")
    copies = base.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 900000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(2.0)).cast("float")
        ).alias("embedding"),
    )
    fresh = emb.filter(
        (F.col("vec_id") >= 200) & (F.col("vec_id") < 210)
    )
    src = str(tmp_path / "emb_two_batches")
    base.coalesce(1).write.mode("overwrite").parquet(src)
    copies.unionByName(fresh).coalesce(1).write.mode("append").parquet(src)

    stream_df = streaming_semantic_dedup(
        spark,
        src,
        spark.read.parquet(src).schema,
        cents,
        threshold=0.9999,
        max_files_per_trigger=1,
    )
    assert stream_df.isStreaming
    query = (
        stream_df.writeStream.format("memory")
        .queryName("sem_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(180)
    finally:
        query.stop()

    rows = {
        r.vec_id: r
        for r in spark.sql("SELECT * FROM sem_dedup_stream").collect()
    }
    assert len(rows) == 220
    # batch-1 originals: all kept (no collinear twins among real rows at
    # threshold 0.9999)
    assert all(rows[i].keep == 1 for i in range(200))
    # batch-2 collinear copies pruned by their batch-1 incumbents —
    # cross-batch state, with the claiming incumbent reported
    for d in range(10):
        r = rows[900000 + d]
        assert r.keep == 0 and r.matched_id == d, (d, r)
    # fresh batch-2 docs survive
    assert all(rows[i].keep == 1 for i in range(200, 210))
