from .image import (
    to_uint16_scale, normalize_uint16, resize_bilinear, gamma_correct,
    anscombe, inverse_anscombe, per_image_quantile, adaptive_normalize,
    standardize, quality_stats, quality_issue_masks, median_filter_3x3,
    bilateral_filter, suppress_artifacts, gaussian_blur, elastic_deform,
    resize_and_normalize, UINT16_MAX,
)
from .clahe import clahe_8bit, clahe_uint16
from .quality import QualityParams, quality_preprocess, quality_preprocess_and_normalize

__all__ = [
    "to_uint16_scale", "normalize_uint16", "resize_bilinear", "gamma_correct",
    "anscombe", "inverse_anscombe", "per_image_quantile", "adaptive_normalize",
    "standardize", "quality_stats", "quality_issue_masks", "median_filter_3x3",
    "bilateral_filter", "suppress_artifacts", "gaussian_blur", "elastic_deform",
    "resize_and_normalize", "UINT16_MAX", "clahe_8bit", "clahe_uint16",
    "QualityParams", "quality_preprocess", "quality_preprocess_and_normalize",
]
