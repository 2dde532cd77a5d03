from .metrics import (
    ConfusionStats, confusion_stats, accuracy, sensitivity, specificity,
    precision, npv, f1_score, auroc, MetricAccumulator,
)
from .losses import (
    cross_entropy, soft_distillation, hard_distillation, distillation_loss,
    deit_dual_loss, progressive_alpha, classification_outputs_to_logits,
)
from .schedules import build_schedule, build_optimizer, layer_decay_mask
from .train_state import TrainState, create_train_state
from .checkpoint import (
    save_checkpoint, load_checkpoint, BestCheckpointManager,
    get_best_checkpoint, cleanup_old_checkpoints, load_teacher,
    make_teacher_fn, make_ensemble_teacher_fn, create_teacher_from_config,
)
from .engine import Trainer, TrainerConfig, FitResult

__all__ = [
    "ConfusionStats", "confusion_stats", "accuracy", "sensitivity",
    "specificity", "precision", "npv", "f1_score", "auroc",
    "MetricAccumulator", "cross_entropy", "soft_distillation",
    "hard_distillation", "distillation_loss", "deit_dual_loss",
    "progressive_alpha", "classification_outputs_to_logits",
    "build_schedule", "build_optimizer", "layer_decay_mask", "TrainState",
    "create_train_state", "save_checkpoint", "load_checkpoint",
    "BestCheckpointManager", "get_best_checkpoint", "cleanup_old_checkpoints",
    "load_teacher", "make_teacher_fn", "make_ensemble_teacher_fn",
    "create_teacher_from_config", "Trainer", "TrainerConfig", "FitResult",
]
