"""True Structured Streaming execution (SURVEY.md §2.12 extension surface):
the SAME windowed-aggregation code that the batch oracle checks, run as a
readStream → watermark → writeStream job against a file source, must
produce the batch answer. Round 1 shipped streaming_window_agg without
ever starting a stream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yellowrush_spark_ml_pipeline_spark.sources import load_table
from yellowrush_spark_ml_pipeline_spark.streaming import streaming_window_agg


def test_streaming_window_agg_matches_batch(spark, sf_small, tmp_path):
    events = load_table(spark, sf_small, "events")
    src = str(tmp_path / "events_stream_src")
    # re-land the fixture as a clean µs-timestamp parquet (the raw fixture
    # is TIMESTAMP(NANOS), which a streaming schema can't declare directly)
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
