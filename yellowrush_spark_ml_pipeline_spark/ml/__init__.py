from .pipelines import (
    baseline_regression_metrics,
    build_rf_pipeline,
    build_text_classifier_pipeline,
    encode_categorical,
    evaluate_binary,
    feature_importances,
    load_model,
    save_model,
    timestamped_model_path,
    train_classifier,
    train_quality_classifier,
    tune_classifier,
)

__all__ = [
    "baseline_regression_metrics",
    "build_rf_pipeline",
    "build_text_classifier_pipeline",
    "encode_categorical",
    "evaluate_binary",
    "feature_importances",
    "load_model",
    "save_model",
    "timestamped_model_path",
    "train_classifier",
    "train_quality_classifier",
    "tune_classifier",
]
