"""ML pipeline layer (SURVEY.md §2.10 M1-M8) — the reference's model
surface as reusable builders.

Reference parity, with its two structural flaws fixed:
* predictions are CACHED before the evaluator loop — the reference
  re-executes the whole prediction plan once per metric
  (nyc_taxi_final.py:909-912);
* every pipeline is a pure function of its inputs (the reference leaks
  notebook state across sections, nyc_taxi_final.py:1053).

RF hyperparameters default to the reference's exact config
(nyc_taxi_final.py:792-802): numTrees=30, maxDepth=8,
minInstancesPerNode=10, subsamplingRate=0.7, featureSubsetStrategy=sqrt,
seed=42, cacheNodeIds=True.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
)
from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class RFConfig:
    """nyc_taxi_final.py:792-802."""

    num_trees: int = 30
    max_depth: int = 8
    min_instances_per_node: int = 10
    subsampling_rate: float = 0.7
    feature_subset_strategy: str = "sqrt"
    seed: int = 42
    cache_node_ids: bool = True
    extra: dict = field(default_factory=dict)


def encode_categorical(
    df: DataFrame, col: str, handle_invalid: str = "keep", drop_last: bool = False
) -> tuple[DataFrame, list[str]]:
    """StringIndexer + OneHotEncoder (M1+M2, nyc_taxi_final.py:581-596):
    categorical column → sparse one-hot vector column ``{col}_ohe``; the
    intermediate index is dropped like the reference does. Returns the
    transformed frame and the produced column names."""
    idx = StringIndexer(
        inputCol=col, outputCol=f"{col}_idx", handleInvalid=handle_invalid
    )
    ohe = OneHotEncoder(
        inputCols=[f"{col}_idx"], outputCols=[f"{col}_ohe"], dropLast=drop_last
    )
    model = Pipeline(stages=[idx, ohe]).fit(df)
    out = model.transform(df).drop(col, f"{col}_idx")
    return out, [f"{col}_ohe"]


def build_rf_pipeline(
    feature_cols: Sequence[str],
    label_col: str,
    config: RFConfig | None = None,
    handle_invalid: str = "skip",
) -> Pipeline:
    """VectorAssembler → RandomForestClassifier (M3+M4+M5,
    nyc_taxi_final.py:785-805). ``handleInvalid='skip'`` silently drops
    rows with nulls/NaN — reference behavior, made an explicit argument."""
    cfg = config or RFConfig()
    assembler = VectorAssembler(
        inputCols=list(feature_cols), outputCol="features", handleInvalid=handle_invalid
    )
    rf = RandomForestClassifier(
        featuresCol="features",
        labelCol=label_col,
        numTrees=cfg.num_trees,
        maxDepth=cfg.max_depth,
        minInstancesPerNode=cfg.min_instances_per_node,
        subsamplingRate=cfg.subsampling_rate,
        featureSubsetStrategy=cfg.feature_subset_strategy,
        seed=cfg.seed,
        cacheNodeIds=cfg.cache_node_ids,
        **cfg.extra,
    )
    return Pipeline(stages=[assembler, rf])


def build_gbt_pipeline(
    feature_cols: Sequence[str],
    label_col: str,
    max_iter: int = 30,
    max_depth: int = 5,
    step_size: float = 0.1,
    seed: int = 42,
    handle_invalid: str = "skip",
) -> Pipeline:
    """VectorAssembler → GBTClassifier: the boosted-tree alternative to
    the reference's RF (same pipeline shape, drop-in for
    `train_classifier(builder=...)`). GBT trains sequentially per
    iteration but each iteration is a full distributed pass — at scale
    the same caching/partitioning rules as RF apply, with ~maxIter
    sequential barriers instead of ~maxDepth."""
    from pyspark.ml.classification import GBTClassifier

    assembler = VectorAssembler(
        inputCols=list(feature_cols), outputCol="features", handleInvalid=handle_invalid
    )
    gbt = GBTClassifier(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        maxDepth=max_depth,
        stepSize=step_size,
        seed=seed,
        cacheNodeIds=True,
    )
    return Pipeline(stages=[assembler, gbt])


def train_classifier(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    config: RFConfig | None = None,
    sample_fraction: float | None = None,
    split: tuple[float, float] = (0.8, 0.2),
    seed: int = 42,
    builder=None,
) -> tuple[PipelineModel, DataFrame, DataFrame]:
    """End-to-end M0→M5: optional Bernoulli sample (nyc_taxi_final.py:744)
    → randomSplit (:808) → fit. Returns (model, train_df, test_df).

    The train split is cached for the fit (tree ensembles scan the data
    once per depth level; without the cache every scan re-runs the whole
    upstream feature plan — measured ~1.8× slower) and unpersisted after,
    mirroring the reference's cache()/unpersist() discipline (:408/:650)."""
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=seed)
    train_df, test_df = df.randomSplit(list(split), seed=seed)
    train_df = train_df.cache()
    pipeline = (
        builder(feature_cols, label_col)
        if builder is not None
        else build_rf_pipeline(feature_cols, label_col, config)
    )
    try:
        model = pipeline.fit(train_df)
    finally:
        train_df.unpersist()
    return model, train_df, test_df


def evaluate_binary(
    model: PipelineModel,
    test_df: DataFrame,
    label_col: str,
    use_evaluators: bool = False,
) -> dict[str, float]:
    """M6+M7 (nyc_taxi_final.py:897-912) with predictions cached ONCE —
    the evaluators each trigger an action and the reference recomputed the
    plan four times.

    Default path: AUC from the MLlib evaluator (needs the score ranking),
    and accuracy / weighted precision / weighted recall / weighted F1
    from ONE confusion-matrix aggregation — same definitions as
    MulticlassClassificationEvaluator (asserted equal to 1e-9 in
    tests/test_ml.py) for a quarter of the jobs.
    ``use_evaluators=True`` runs the four MLlib evaluator passes instead."""
    predictions = model.transform(test_df).select(
        label_col, "rawPrediction", "prediction"
    )
    predictions = predictions.cache()
    try:
        auc = BinaryClassificationEvaluator(
            labelCol=label_col, rawPredictionCol="rawPrediction", metricName="areaUnderROC"
        ).evaluate(predictions)
        if use_evaluators:
            multi = MulticlassClassificationEvaluator(
                labelCol=label_col, predictionCol="prediction"
            )
            metrics = {
                "roc_auc": auc,
                "accuracy": multi.setMetricName("accuracy").evaluate(predictions),
                "precision": multi.setMetricName("weightedPrecision").evaluate(predictions),
                "recall": multi.setMetricName("weightedRecall").evaluate(predictions),
                "f1": multi.setMetricName("f1").evaluate(predictions),
            }
        else:
            metrics = {"roc_auc": auc, **_multiclass_from_confusion(predictions, label_col)}
    finally:
        predictions.unpersist()
    return metrics


def _multiclass_from_confusion(
    predictions: DataFrame, label_col: str
) -> dict[str, float]:
    """Weighted multiclass metrics from a single (label, prediction)
    count aggregation — MulticlassClassificationEvaluator's definitions
    (weightedPrecision/Recall/F1 weighted by true-class support) without
    four full passes."""
    cells = {
        (r["lab"], r["pred"]): r["n"]
        for r in predictions.groupBy(
            F.col(label_col).cast("double").alias("lab"),
            F.col("prediction").cast("double").alias("pred"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    classes = sorted({k[0] for k in cells} | {k[1] for k in cells})
    total = sum(cells.values())
    if total == 0:  # empty test frame — degrade like an all-wrong model
        return {"accuracy": 0.0, "precision": 0.0, "recall": 0.0, "f1": 0.0}
    correct = sum(n for (lab, pred), n in cells.items() if lab == pred)
    prec_w = rec_w = f1_w = 0.0
    for c in classes:
        tp = cells.get((c, c), 0)
        fp = sum(n for (lab, pred), n in cells.items() if pred == c and lab != c)
        support = sum(n for (lab, _), n in cells.items() if lab == c)
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / support if support else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        w = support / total
        prec_w += w * prec
        rec_w += w * rec
        f1_w += w * f1
    return {
        "accuracy": correct / total,
        "precision": prec_w,
        "recall": rec_w,
        "f1": f1_w,
    }


def feature_importances(
    model: PipelineModel,
    feature_cols: Sequence[str] | None = None,
    df: DataFrame | None = None,
) -> list[tuple[str, float]]:
    """M8 (nyc_taxi_final.py:833-842): (name, importance) sorted desc.
    Driver-side by design — model state is a tiny driver object.

    When a vector input (e.g. one-hot) expands to multiple slots, plain
    name-zipping misaligns (the reference's own zip at :836 has this flaw);
    pass ``df`` to resolve true per-slot names from the assembler's ML-attr
    metadata (one row transformed, nothing collected)."""
    rf_model = model.stages[-1]
    imps = rf_model.featureImportances.toArray().tolist()
    if feature_cols is not None and len(feature_cols) == len(imps):
        names = list(feature_cols)
    elif df is not None:
        meta = model.transform(df.limit(1)).schema["features"].metadata["ml_attr"]
        slots = sorted(
            (a for group in meta.get("attrs", {}).values() for a in group),
            key=lambda a: a["idx"],
        )
        names = [a["name"] for a in slots]
    else:
        names = [f"f{i}" for i in range(len(imps))]
    return sorted(zip(names, imps), key=lambda t: t[1], reverse=True)


def tune_classifier(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    num_trees_grid: Sequence[int] = (10, 30),
    max_depth_grid: Sequence[int] = (4, 8),
    n_folds: int = 3,
    seed: int = 42,
    parallelism: int = 2,
):
    """Hyperparameter search over the reference's RF pipeline: k-fold
    CrossValidator on (numTrees, maxDepth) scored by areaUnderROC — the
    tuning surface the reference hardcodes away (its config is fixed at
    nyc_taxi_final.py:792-802; this searches around it with the same
    pipeline object).

    Scale posture: total work is folds x grid-size model fits.
    ``parallelism`` trains candidate models concurrently inside each
    fold (thread-level on the driver, cluster-level in execution);
    MLlib caches each fold's train/validation split once across all
    candidates, so the input is scanned per fold, not per candidate.
    At 100 TB you tune on a stratified sample and refit the winner on
    the full data — which is exactly ``bernoulli_sample`` (M0a) piped
    into this function, then ``train_classifier`` with the returned
    best params.

    Returns ``(cv_model, results)`` where results is a list of
    ``{"numTrees": .., "maxDepth": .., "avg_auc": ..}`` sorted best
    first (driver-side: grid-size elements, not data).
    """
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    pipeline = build_rf_pipeline(feature_cols, label_col, RFConfig(seed=seed))
    rf = pipeline.getStages()[-1]
    grid = (
        ParamGridBuilder()
        .addGrid(rf.numTrees, list(num_trees_grid))
        .addGrid(rf.maxDepth, list(max_depth_grid))
        .build()
    )
    evaluator = BinaryClassificationEvaluator(
        labelCol=label_col, metricName="areaUnderROC"
    )
    cv = CrossValidator(
        estimator=pipeline,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=n_folds,
        seed=seed,
        parallelism=parallelism,
        collectSubModels=False,
    )
    model = cv.fit(df)
    results = sorted(
        (
            {
                "numTrees": pm[rf.numTrees],
                "maxDepth": pm[rf.maxDepth],
                "avg_auc": metric,
            }
            for pm, metric in zip(grid, model.avgMetrics)
        ),
        key=lambda r: r["avg_auc"],
        reverse=True,
    )
    return model, results


def baseline_regression_metrics(
    df: DataFrame,
    label_col: str,
    group_col: str,
) -> DataFrame:
    """Regression-evaluator surface (RegressionEvaluator's mae/rmse/r2)
    computed against the group-mean baseline regressor, in EXACT integer
    arithmetic so the result is bit-identical across engines and
    partitionings.

    Everything runs in integer cents: the label is fixed to 2 decimals
    (lossless for money-style columns), the per-group and global means
    are floor-divided IN THE INTEGER/DECIMAL DOMAIN —
    ``(s - pmod(s, n)) / n`` makes the numerator exactly divisible, so
    the quotient is exact even when a group's cent-sum exceeds 2^53
    (a double round-trip there would round the sum before dividing; the
    oracle floor-divides identically). FLOOR-style division also has no
    tie-break mode, so the half-up-vs-half-even drift that bit
    ``embedding_dim_stats`` in round 2 cannot occur. Every per-row error
    term is an exact integer; sums of squares go through DECIMAL(38,0)
    (they exceed int64 at 15k+ rows); doubles appear only in the final
    metric expressions, with identical operation order on the oracle side.

    Engine note: at sst=0 (constant label) r2 is NULL here (try_divide)
    and the oracle SQL uses NULLIF(sst, 0) to match; IEEE-default engines
    would give -inf instead — the NULL is the deliberate contract.

    Plan: one window pass partitioned by ``group_col`` (decimal/long sum
    — order-independent), a broadcast 1-row cross join for the global
    mean, then a single hash aggregation. Two scans of the input, no
    driver collects.
    """
    from pyspark.sql import Window

    def floor_div(s, n):
        # exact floor division: numerator made divisible via pmod, then
        # decimal division (integer quotient => exact at any magnitude)
        s = s.cast("decimal(38,0)")
        return ((s - F.pmod(s, n)) / n).cast("bigint")

    y = (F.col(label_col).cast("decimal(18,2)") * 100).cast("bigint")
    base = df.select(F.col(group_col).alias("_grp"), y.alias("_y"))
    w = Window.partitionBy("_grp")
    pred = base.withColumn(
        "_pred",
        floor_div(F.sum("_y").over(w), F.count(F.lit(1)).over(w)),
    )
    g = base.agg(
        floor_div(F.sum("_y"), F.count(F.lit(1))).alias("_ybar")
    )
    joined = pred.crossJoin(F.broadcast(g))
    err = F.col("_y") - F.col("_pred")
    dev = F.col("_y") - F.col("_ybar")
    sq = lambda c: F.sum((c.cast("decimal(19,0)") * c.cast("decimal(19,0)")))  # noqa: E731
    n = F.count(F.lit(1))
    return joined.agg(
        n.cast("bigint").alias("n"),
        (F.sum(F.abs(err)).cast("double") / n / 100).alias("mae"),
        F.sqrt(sq(err).cast("double") / n).alias("rmse_cents"),
        # try_divide: a constant label column has sst=0 — r2 is undefined
        # (null), not a DIVIDE_BY_ZERO crash under ANSI (hypothesis-found)
        (
            F.lit(1.0)
            - F.try_divide(sq(err).cast("double"), sq(dev).cast("double"))
        ).alias("r2"),
    ).select(
        "n",
        "mae",
        (F.col("rmse_cents") / 100).alias("rmse"),
        "r2",
    )


def save_model(model: PipelineModel, path: str) -> None:
    """S7 (nyc_taxi_final.py:956-960): overwrite-save a fitted pipeline."""
    model.write().overwrite().save(path)


def timestamped_model_path(base: str, name: str = "model", now=None) -> str:
    """The reference's wall-clock model-path convention
    (nyc_taxi_final.py:956-960): ``{base}/{name}_{YYYYMMDD_HHMMSS}``.
    ``now`` is injectable (a ``datetime``) so tests and backfills stay
    deterministic; None uses current UTC."""
    import datetime as _dt

    ts = (now or _dt.datetime.now(_dt.timezone.utc)).strftime("%Y%m%d_%H%M%S")
    return f"{base.rstrip('/')}/{name}_{ts}"


def load_model(path: str) -> PipelineModel:
    return PipelineModel.load(path)


def build_text_classifier_pipeline(
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 14,
    reg_param: float = 0.01,
    max_iter: int = 50,
    seed: int = 42,
) -> Pipeline:
    """Text quality/domain classifier pipeline (the FineWeb-edu /
    fastText-shaped pattern a curation stack trains on a small labeled
    seed set and scores the whole corpus with): RegexTokenizer →
    HashingTF (feature hashing — no vocabulary fit, so the transform is
    stateless and scales to any corpus) → IDF → LogisticRegression.

    Feature hashing is THE scale choice here: a CountVectorizer fits a
    driver-side vocabulary over the corpus (O(vocab) driver memory, one
    extra full pass); hashing maps tokens straight to a fixed-width
    sparse vector in the executors. IDF is the one fitted stats pass,
    over the tiny labeled set only.

    At 100 TB the trained model broadcasts to executors and scoring is a
    narrow map — the exact deployment shape of a production quality
    gate."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col,
        outputCol="_words",
        pattern=r"[^\p{L}\p{N}]+",
        gaps=True,
        toLowercase=True,
    )
    tf = HashingTF(
        inputCol="_words", outputCol="_tf", numFeatures=num_features
    )
    idf = IDF(inputCol="_tf", outputCol="_tfidf")
    lr = LogisticRegression(
        featuresCol="_tfidf",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    return Pipeline(stages=[tok, tf, idf, lr])


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    train_fraction: float = 0.8,
    seed: int = 42,
    **pipeline_kwargs,
):
    """Fit the text classifier on a labeled seed set and return
    (model, train_df, test_df) — the `train_classifier` contract for the
    text modality. The split is seeded randomSplit (the seed set is small
    and driver-adjacent; corpus-scale scoring happens at transform
    time)."""
    pipe = build_text_classifier_pipeline(
        text_col=text_col, label_col=label_col, seed=seed, **pipeline_kwargs
    )
    train_df, test_df = labeled.randomSplit(
        [train_fraction, 1 - train_fraction], seed=seed
    )
    return pipe.fit(train_df), train_df, test_df


def _normalize_artifact_dir(out_path: str) -> None:
    """Make a single-file parquet artifact directory byte-stable across
    re-runs: rename Spark's UUID part file to ``part-00000.parquet`` and
    drop the ``_SUCCESS`` / ``.crc`` sidecars. Committed artifacts
    (the sf0.01 predcache the DuckDB oracle reads) would otherwise churn
    a fresh filename into git on every regeneration even when the
    seed-pinned contents are identical."""
    import glob as _glob
    import os

    if not os.path.isdir(out_path):
        return
    for side in _glob.glob(os.path.join(out_path, "_SUCCESS*")) + _glob.glob(
        os.path.join(out_path, ".*.crc")
    ):
        os.remove(side)
    parts = sorted(_glob.glob(os.path.join(out_path, "part-*.parquet")))
    for i, p in enumerate(parts):
        dst = os.path.join(out_path, f"part-{i:05d}.parquet")
        if p != dst:
            os.replace(p, dst)


def _publish_artifact(preds: DataFrame, out_path: str) -> None:
    """Publish a small eval artifact WITHOUT byte churn (round 9): write
    to a tmp sibling, then value-compare against any existing artifact
    and keep the OLD bytes when the (sorted) contents are identical.
    Stable filenames alone proved insufficient — seed-pinned re-runs
    produce value-identical rows but byte-different parquet (row-order
    and encoding drift), which dirtied git on every clean run of the
    committed sf0.01 predcache. Rows are also sorted before writing so
    a first write is as deterministic as Spark allows. The pandas
    compare is driver-side by design: the artifact is an eval split of
    a sample — bounded, never the fact table."""
    import os
    import shutil

    cols = preds.columns
    tmp = out_path.rstrip("/") + ".__tmp__"
    (
        preds.coalesce(1)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    _normalize_artifact_dir(tmp)
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(out_path):
            old = pq.read_table(out_path).to_pandas()
            new = pq.read_table(tmp).to_pandas()
            if list(old.columns) == list(new.columns):
                o = old.sort_values(cols).reset_index(drop=True)
                n = new.sort_values(cols).reset_index(drop=True)
                if o.equals(n):
                    shutil.rmtree(tmp)
                    return
    except Exception:
        pass  # unreadable/missing old artifact -> replace it
    if os.path.isdir(out_path):
        shutil.rmtree(out_path)
    os.replace(tmp, out_path)


def binary_eval_artifact(
    model: PipelineModel,
    test_df: DataFrame,
    label_col: str,
    out_path: str,
) -> DataFrame:
    """Oracle-checkable binary evaluation (round 7): persist the test-split
    predictions as a parquet ARTIFACT — (label, prediction, prob) with
    prob = P(class 1) — then derive every metric from the persisted
    relation in EXACT integer arithmetic, so a SQL oracle reading the same
    artifact replays the entire derivation:

    * confusion counts tp/fp/fn/tn — integer aggregation;
    * accuracy/precision/recall/f1 in milli-units — one truncating
      division each, non-negative numerators (Spark div == DuckDB //);
    * AUC in nano-units via the tie-corrected Mann-Whitney identity
      AUC = (2*Rpos - npos*(npos+1)) / (2*npos*nneg), where 2*Rpos uses
      doubled average ranks (2*rank + ties - 1) to stay integral. No
      float arithmetic anywhere — probabilities are only ORDERED, and
      both engines order the identical persisted doubles.

    The model-dependent half (the scores) is deliberately NOT re-derived
    by the oracle — models aren't SQL — but everything downstream of the
    scores is differentially checked, which is exactly the half where the
    round-4/5 metric-derivation bugs lived. MLlib-evaluator parity for
    the float path stays pinned in tests/test_ml.py.

    Scale note: the rank window is unpartitioned but runs over the
    EVAL artifact only (test split of a sample — bounded by design,
    never the fact table).
    """
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import Window

    preds = model.transform(test_df).select(
        F.col(label_col).cast("int").alias("label"),
        F.col("prediction").cast("int").alias("prediction"),
        vector_to_array(F.col("probability"))[1].alias("prob"),
    )
    _publish_artifact(preds, out_path)

    spark = test_df.sparkSession
    p = spark.read.parquet(out_path)
    c = p.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(((F.col("label") == 1) & (F.col("prediction") == 1)).cast("bigint")).alias("tp"),
        F.sum(((F.col("label") == 0) & (F.col("prediction") == 1)).cast("bigint")).alias("fp"),
        F.sum(((F.col("label") == 1) & (F.col("prediction") == 0)).cast("bigint")).alias("fn"),
        F.sum(((F.col("label") == 0) & (F.col("prediction") == 0)).cast("bigint")).alias("tn"),
    )
    w = Window.orderBy("prob")
    ranked = p.select(
        "label",
        (
            F.lit(2) * F.rank().over(w)
            + F.count(F.lit(1)).over(Window.partitionBy("prob"))
            - F.lit(1)
        ).alias("_r2"),
    )
    r = ranked.agg(
        F.sum(F.when(F.col("label") == 1, F.col("_r2")).otherwise(F.lit(0))).alias("r2pos"),
        F.sum((F.col("label") == 1).cast("bigint")).alias("npos"),
        F.sum((F.col("label") == 0).cast("bigint")).alias("nneg"),
    )
    return (
        c.crossJoin(F.broadcast(r))
        .select(
            "n",
            "tp",
            "fp",
            "fn",
            "tn",
            # all milli ratios route the x1000 products through
            # DECIMAL(38,0): BIGINT would wrap past ~9.2e15 eval rows —
            # absurd for an eval set, but the overflow sweep demands the
            # 100 TB-proof form everywhere (div on decimals still
            # truncates and yields BIGINT)
            F.expr(
                "CAST((CAST(1000 AS DECIMAL(38,0)) * (tp + tn)) div n"
                " AS BIGINT)"
            ).alias("accuracy_milli"),
            F.expr(
                "CASE WHEN tp + fp > 0 THEN"
                " CAST((CAST(1000 AS DECIMAL(38,0)) * tp) div (tp + fp)"
                " AS BIGINT) END"
            ).alias("precision_milli"),
            F.expr(
                "CASE WHEN tp + fn > 0 THEN"
                " CAST((CAST(1000 AS DECIMAL(38,0)) * tp) div (tp + fn)"
                " AS BIGINT) END"
            ).alias("recall_milli"),
            F.expr(
                "CASE WHEN tp + fp + fn > 0 THEN"
                " CAST((CAST(2000 AS DECIMAL(38,0)) * tp)"
                " div (CAST(2 AS DECIMAL(38,0)) * tp + fp + fn)"
                " AS BIGINT) END"
            ).alias("f1_milli"),
            F.expr(
                "CASE WHEN npos > 0 AND nneg > 0 THEN"
                " CAST((CAST(r2pos AS DECIMAL(38,0)) - CAST(npos AS DECIMAL(38,0)) * (npos + 1))"
                "      * 1000000000 AS DECIMAL(38,0))"
                " div (CAST(2 AS DECIMAL(38,0)) * npos * nneg) END"
            ).cast("long").alias("auc_nano"),
        )
    )
