from .gradcam import gradcam, gradcam_overlay
from .attention import (
    collect_attention_maps, cls_attention_heatmap, attention_rollout,
    gradient_patch_importance, swin_stage_feature_maps, attention_figure,
)
from .evaluation import (
    predict_probs, binary_report, roc_curve_points, evaluate_checkpoint,
    evaluate_ensemble_kfold, confusion_roc_figure,
)
from .charts import (
    REFERENCE_RESULTS, load_results_from_summary, performance_chart,
    accuracy_vs_params_chart, visualize_samples, visualize_image_statistics,
    visualize_augmentations, visualize_batch_diversity,
)

__all__ = [
    "gradcam", "gradcam_overlay", "collect_attention_maps",
    "cls_attention_heatmap", "attention_rollout", "gradient_patch_importance",
    "swin_stage_feature_maps", "attention_figure", "predict_probs",
    "binary_report", "roc_curve_points", "evaluate_checkpoint",
    "evaluate_ensemble_kfold", "confusion_roc_figure", "REFERENCE_RESULTS",
    "load_results_from_summary", "performance_chart",
    "accuracy_vs_params_chart", "visualize_samples",
    "visualize_image_statistics", "visualize_augmentations",
    "visualize_batch_diversity",
]
