"""ML layer tests (SURVEY.md §2.10 M1-M8): categorical encoding actually
executed, seed-pinned metric bands, feature importances, and model
persistence round-trip — the checks SURVEY §5 promised and round 1 lacked.
"""

from __future__ import annotations

import pytest
from pyspark.ml.linalg import VectorUDT
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from yellowrush_spark_ml_pipeline_spark.functions.scalar import binary_flag
from yellowrush_spark_ml_pipeline_spark.ml import (
    encode_categorical,
    evaluate_binary,
    feature_importances,
    train_classifier,
)
from yellowrush_spark_ml_pipeline_spark.ml.pipelines import load_model, save_model
from yellowrush_spark_ml_pipeline_spark.operators import features
from yellowrush_spark_ml_pipeline_spark.sources import load_table


@pytest.fixture(scope="module")
def labeled_orders(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    df = (
        features.add_time_features(orders, "o_orderdate")
        .withColumn("is_high_value", binary_flag(F.col("o_totalprice") > 300000.0))
        .select(
            "o_orderpriority", "month", "day_of_week", "is_holiday", "is_high_value",
            F.log1p("o_totalprice").alias("log_price"),
        )
    )
    return df.cache()


def test_encode_categorical_produces_ohe_vector(spark, labeled_orders):
    out, cols = encode_categorical(labeled_orders, "o_orderpriority")
    assert cols == ["o_orderpriority_ohe"]
    field = out.schema["o_orderpriority_ohe"]
    assert isinstance(field.dataType, VectorUDT)
    # 5 priority levels + handleInvalid="keep" bucket, dropLast=False
    n_cats = labeled_orders.select("o_orderpriority").distinct().count()
    first = out.select("o_orderpriority_ohe").first()[0]
    assert first.size in (n_cats, n_cats + 1)
    # intermediate index column dropped like the reference (:596)
    assert "o_orderpriority_idx" not in out.columns


def test_classifier_metric_band(spark, sf_small):
    """Seed-pinned quality gate: is_high_value is a threshold on a feature
    (log_price), so the RF must be near-separable — AUC>=0.95. A metrics
    regression (wrong label, broken encoding, leaked split) fails this."""
    mdf = entrymod.q_ml_classifier_metrics(spark, sf_small)
    row = mdf.first().asDict()
    # round 7: the registry query returns the oracle-checkable integer
    # form (confusion counts + milli metrics + nano Mann-Whitney AUC)
    assert set(row) == {
        "n", "tp", "fp", "fn", "tn",
        "accuracy_milli", "precision_milli", "recall_milli", "f1_milli",
        "auc_nano",
    }
    assert row["n"] == row["tp"] + row["fp"] + row["fn"] + row["tn"]
    assert 950_000_000 <= row["auc_nano"] <= 1_000_000_000, row
    assert 900 <= row["accuracy_milli"] <= 1000, row
    assert 900 <= row["f1_milli"] <= 1000, row


def test_feature_importances_rank(spark, labeled_orders):
    df, ohe_cols = encode_categorical(labeled_orders, "o_orderpriority")
    feats = ["month", "day_of_week", "is_holiday", "log_price", *ohe_cols]
    model, _, _ = train_classifier(df, feats, "is_high_value")
    # OHE expands to multiple slots → names must come from vector metadata
    imps = feature_importances(model, feats, df=df)
    assert imps[0][0] == "log_price", imps
    assert abs(sum(v for _, v in imps) - 1.0) < 1e-6
    assert any(name.startswith("o_orderpriority_ohe") for name, _ in imps)


def test_confusion_metrics_match_mllib_evaluators(spark, labeled_orders):
    """The single-pass confusion-matrix path must reproduce the MLlib
    evaluator values exactly (same definitions, fewer jobs)."""
    feats = ["month", "day_of_week", "log_price"]
    model, _, test_df = train_classifier(labeled_orders, feats, "is_high_value")
    fast = evaluate_binary(model, test_df, "is_high_value")
    slow = evaluate_binary(model, test_df, "is_high_value", use_evaluators=True)
    assert set(fast) == set(slow)
    for k in fast:
        assert abs(fast[k] - slow[k]) < 1e-9, (k, fast[k], slow[k])


def test_evaluate_binary_single_materialization(spark, labeled_orders, monkeypatch):
    """Round-8 regression guard for the cached-evaluation path
    (BENCH_r07's rf_train_sec doubled with no code change — make a real
    regression impossible to miss): evaluate_binary must call
    model.transform exactly ONCE and cache the predictions relation
    exactly ONCE; every metric then derives from that single cached
    materialization instead of re-running the RF scoring per metric
    (the reference recomputed the plan four times)."""
    feats = ["month", "day_of_week", "log_price"]
    model, _, test_df = train_classifier(labeled_orders, feats, "is_high_value")

    calls = {"transform": 0, "cache": 0}
    model_cls = type(model)
    df_cls = type(test_df)
    orig_transform = model_cls.transform
    orig_cache = df_cls.cache

    def counting_transform(self, *a, **kw):
        calls["transform"] += 1
        return orig_transform(self, *a, **kw)

    def counting_cache(self):
        calls["cache"] += 1
        return orig_cache(self)

    monkeypatch.setattr(model_cls, "transform", counting_transform)
    monkeypatch.setattr(df_cls, "cache", counting_cache)
    metrics = evaluate_binary(model, test_df, "is_high_value")
    assert calls["transform"] == 1, calls
    assert calls["cache"] == 1, calls
    assert 0.5 < metrics["roc_auc"] <= 1.0


def test_model_save_load_identical_predictions(spark, labeled_orders, tmp_path):
    """S7 round-trip (nyc_taxi_final.py:956-960): persisted model must
    reproduce the in-memory model's predictions exactly."""
    feats = ["month", "day_of_week", "log_price"]
    model, _, test_df = train_classifier(labeled_orders, feats, "is_high_value")
    path = str(tmp_path / "rf_model")
    save_model(model, path)
    reloaded = load_model(path)
    orig = model.transform(test_df).select("prediction").collect()
    rt = reloaded.transform(test_df).select("prediction").collect()
    assert orig == rt
    metrics = evaluate_binary(reloaded, test_df, "is_high_value")
    assert 0.9 <= metrics["roc_auc"] <= 1.0


def test_timestamped_model_path():
    """Reference wall-clock path convention (nyc_taxi_final.py:956-960),
    injectable clock for determinism."""
    import datetime as dt

    from yellowrush_spark_ml_pipeline_spark.ml import timestamped_model_path

    fixed = dt.datetime(2024, 6, 30, 12, 34, 56)
    assert (
        timestamped_model_path("/models/", "congestion_rf", now=fixed)
        == "/models/congestion_rf_20240630_123456"
    )
    assert timestamped_model_path("/m", now=fixed) == "/m/model_20240630_123456"


def test_gbt_builder_drop_in(spark, labeled_orders):
    """GBT via the builder slot: same pipeline shape, near-separable
    label → seed-pinned AUC band; proves train/evaluate are
    model-agnostic."""
    from yellowrush_spark_ml_pipeline_spark.ml.pipelines import (
        build_gbt_pipeline,
        evaluate_binary,
    )

    feats = ["month", "day_of_week", "is_holiday", "log_price"]
    model, _, test_df = train_classifier(
        labeled_orders,
        feats,
        "is_high_value",
        builder=lambda f, l: build_gbt_pipeline(f, l, max_iter=10, max_depth=4),
    )
    metrics = evaluate_binary(model, test_df, "is_high_value")
    assert 0.95 <= metrics["roc_auc"] <= 1.0, metrics
    assert 0.9 <= metrics["accuracy"] <= 1.0, metrics


def test_baseline_regression_metrics_known_values(spark):
    """Hand-computed metrics on a 4-row frame: group A = {1.00, 2.00,
    3.00} (pred 2.00), group B = {10.00} (pred 10.00); global mean
    floor(400 cents). mae = 0.5, rmse = sqrt(5000)/100, r2 = 0.96."""
    import math

    from yellowrush_spark_ml_pipeline_spark.ml.pipelines import (
        baseline_regression_metrics,
    )

    df = spark.createDataFrame(
        [("A", 1.00), ("A", 2.00), ("A", 3.00), ("B", 10.00)],
        ["grp", "price"],
    )
    row = baseline_regression_metrics(df, "price", "grp").collect()[0]
    assert row.n == 4
    assert row.mae == 0.5
    assert row.rmse == math.sqrt(20000 / 4) / 100
    assert row.r2 == 1.0 - 20000 / 500000


def test_tune_classifier_grid_search(spark, labeled_orders):
    """CrossValidator slot: the grid is fully scored (one avg-AUC per
    cell), results come back best-first, the near-separable label keeps
    the winner's AUC high, and the fitted best model predicts."""
    from yellowrush_spark_ml_pipeline_spark.ml import tune_classifier

    feats = ["month", "day_of_week", "is_holiday", "log_price"]
    model, results = tune_classifier(
        labeled_orders,
        feats,
        "is_high_value",
        num_trees_grid=(5, 10),
        max_depth_grid=(4,),
        n_folds=2,
        seed=42,
    )
    assert len(results) == 2  # 2 numTrees x 1 maxDepth
    assert {(r["numTrees"], r["maxDepth"]) for r in results} == {(5, 4), (10, 4)}
    assert results[0]["avg_auc"] >= results[1]["avg_auc"]
    assert results[0]["avg_auc"] >= 0.95
    preds = model.transform(labeled_orders)
    assert preds.select("prediction").distinct().count() <= 2


def test_text_quality_classifier_separates_planted_spam(spark, sf_oracle):
    """HashingTF+IDF+LogReg must separate token-soup spam from prose with
    near-perfect held-out AUC, deterministically (seed-pinned split)."""
    from pyspark.sql import functions as F

    from yellowrush_spark_ml_pipeline_spark.ml import (
        evaluate_binary,
        train_quality_classifier,
    )
    from yellowrush_spark_ml_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_oracle, "documents").select("doc_id", "text")
    clean = docs.withColumn("label", F.lit(0.0))
    spam = docs.select(
        (F.col("doc_id") + 5000000).alias("doc_id"),
        F.concat_ws(
            " ", F.array_repeat(F.concat(F.lit("buy"), F.col("doc_id") % 7), 40)
        ).alias("text"),
        F.lit(1.0).alias("label"),
    )
    model, _, test_df = train_quality_classifier(clean.unionByName(spam))
    m1 = evaluate_binary(model, test_df, "label")
    assert m1["roc_auc"] > 0.99, m1
    assert m1["accuracy"] > 0.97, m1
    # deterministic: second fit reproduces identical metrics
    model2, _, test2 = train_quality_classifier(clean.unionByName(spam))
    m2 = evaluate_binary(model2, test2, "label")
    assert m1 == m2
    # corpus-scale scoring is a transform (narrow map) over unlabeled text
    scored = model.transform(docs.withColumn("label", F.lit(0.0)))
    assert scored.count() == docs.count()
