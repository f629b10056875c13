"""Aggregate-operator unit tests: cube semantics and empty-input
robustness (operators must degrade to empty/zero results, not throw)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yellowrush_spark_ml_pipeline_spark.operators import dedup
from yellowrush_spark_ml_pipeline_spark.operators.aggregates import (
    cube_agg,
    validate_table,
)
from yellowrush_spark_ml_pipeline_spark.sources import load_table
from yellowrush_spark_ml_pipeline_spark.streaming import sessionize


def test_cube_agg_all_subsets(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    out = cube_agg(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        {"n": F.count(F.lit(1))},
    ).cache()
    # 2^2 grouping levels present: (both), (status only), (priority only), ()
    lvls = {r.grouping_lvl for r in out.select("grouping_lvl").distinct().collect()}
    assert lvls == {0, 1, 2, 3}
    # grand total row equals the table count
    total = out.filter(F.col("grouping_lvl") == 3).first().n
    assert total == orders.count()
    # level-0 rows equal the plain groupBy
    plain = {
        (r.o_orderstatus, r.o_orderpriority): r.n
        for r in orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    cube0 = {
        (r.o_orderstatus, r.o_orderpriority): r.n
        for r in out.filter(F.col("grouping_lvl") == 0).collect()
    }
    assert cube0 == plain
    out.unpersist()


def test_hypertable_rollup_rejects_non_nesting_levels(spark, sf_small):
    import pytest as _pytest

    from yellowrush_spark_ml_pipeline_spark.streaming import hypertable_rollup

    ev = load_table(spark, sf_small, "events")
    with _pytest.raises(ValueError, match="must nest"):
        hypertable_rollup(ev, levels=("1 hour", "90 minutes"))


def test_evaluate_metrics_on_empty_predictions(spark, sf_small):
    """Empty test frame degrades to zero metrics, not ZeroDivisionError."""
    from yellowrush_spark_ml_pipeline_spark.functions.scalar import binary_flag
    from yellowrush_spark_ml_pipeline_spark.ml import evaluate_binary, train_classifier

    orders = load_table(spark, sf_small, "orders").select(
        F.col("o_totalprice").alias("x"),
        binary_flag(F.col("o_totalprice") > 300000.0).alias("y"),
    )
    model, _, test_df = train_classifier(orders, ["x"], "y")
    empty = test_df.filter(F.lit(False))
    m = evaluate_binary(model, empty, "y")
    assert m["accuracy"] == 0.0 and m["f1"] == 0.0


def test_assert_valid_gate(spark, sf_small):
    import pytest as _pytest

    from yellowrush_spark_ml_pipeline_spark.operators.aggregates import assert_valid

    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")
    out = assert_valid(li, nonnegative_cols=["l_quantity"])
    assert out["row_count"] > 0

    bad = li.withColumn(
        "l_quantity", F.when(F.col("l_orderkey") % 100 == 0, -1.0).otherwise(F.col("l_quantity"))
    )
    with _pytest.raises(ValueError, match="negative_l_quantity"):
        assert_valid(bad, nonnegative_cols=["l_quantity"])

    with _pytest.raises(ValueError, match="empty"):
        assert_valid(li.filter(F.lit(False)))


def test_operators_on_empty_input(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").filter(F.lit(False))
    assert dedup.exact_dedup(docs).count() == 0
    assert dedup.simhash(docs).count() == 0
    assert dedup.minhash_dedup_pairs(docs).count() == 0

    ev = load_table(spark, sf_small, "events").filter(F.lit(False))
    assert sessionize(ev).count() == 0

    li = load_table(spark, sf_small, "lineitem").filter(F.lit(False))
    v = validate_table(
        li.select("l_orderkey", "l_quantity"), nonnegative_cols=["l_quantity"]
    ).first()
    assert v.row_count == 0
