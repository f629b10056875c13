from .pipelines import (
    build_rf_pipeline,
    encode_categorical,
    evaluate_binary,
    feature_importances,
    load_model,
    save_model,
    timestamped_model_path,
    train_classifier,
)

__all__ = [
    "build_rf_pipeline",
    "encode_categorical",
    "evaluate_binary",
    "feature_importances",
    "load_model",
    "save_model",
    "timestamped_model_path",
    "train_classifier",
]
