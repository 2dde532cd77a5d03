from .cnn_ensemble import (
    CNNEnsemble, build_cnn_ensemble, build_ensemble_from_members,
    DEFAULT_MODEL_ACCURACIES,
)

__all__ = ["CNNEnsemble", "build_cnn_ensemble", "build_ensemble_from_members",
           "DEFAULT_MODEL_ACCURACIES"]
