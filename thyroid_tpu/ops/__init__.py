from .image import (
    to_uint16_scale, normalize_uint16, resize_bilinear, gamma_correct,
    anscombe, inverse_anscombe, per_image_quantile, per_image_quantile_fast,
    per_image_quantiles_multiway, adaptive_normalize,
    standardize, quality_stats, quality_issue_masks, median_filter_3x3,
    bilateral_filter, suppress_artifacts, gaussian_blur, elastic_deform,
    resize_and_normalize, UINT16_MAX,
)
from .percentile import fused_percentile_normalize
from .clahe import clahe_8bit, clahe_uint16
from .quality import QualityParams, quality_preprocess, quality_preprocess_and_normalize

__all__ = [
    "to_uint16_scale", "normalize_uint16", "resize_bilinear", "gamma_correct",
    "anscombe", "inverse_anscombe", "per_image_quantile", "per_image_quantile_fast",
    "per_image_quantiles_multiway", "adaptive_normalize",
    "standardize", "quality_stats", "quality_issue_masks", "median_filter_3x3",
    "bilateral_filter", "suppress_artifacts", "gaussian_blur", "elastic_deform",
    "resize_and_normalize", "UINT16_MAX", "fused_percentile_normalize",
    "clahe_8bit", "clahe_uint16",
    "QualityParams", "quality_preprocess", "quality_preprocess_and_normalize",
]

from .augment import (
    microscopy_normalize, random_hflip, random_vflip, affine_warp, rotate,
    random_rotation, shear, translate, adjust_brightness, adjust_contrast,
    adjust_sharpness, auto_contrast, equalize, posterize, solarize,
    gaussian_noise, random_blur, microscopy_augment, random_patch_drop,
    randaugment, compute_patch_quality, quality_aware_patch_augment,
    mixup, cutmix, train_augment, vit_augment, tta_views,
)

from .attention import fused_window_attention, window_attention_reference
