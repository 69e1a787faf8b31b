from .price_model import (
    build_pipeline,
    coefficient_table,
    cv_fit,
    evaluate_r2,
    prepare_part_features,
)

__all__ = [
    "build_pipeline",
    "coefficient_table",
    "cv_fit",
    "evaluate_r2",
    "prepare_part_features",
]
