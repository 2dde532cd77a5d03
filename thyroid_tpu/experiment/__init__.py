from .base_experiment import BaseExperiment
from .kfold_experiment import KFoldExperiment
from .ablation_experiment import AblationExperiment
from .all_models_experiment import AllModelsFullKFoldExperiment
from .manager import ExperimentManager, launch_experiment

__all__ = [
    "BaseExperiment", "KFoldExperiment", "AblationExperiment",
    "AllModelsFullKFoldExperiment", "ExperimentManager", "launch_experiment",
]
