from .node import ConfigNode
from .loader import (
    compose,
    load_model_config,
    list_model_configs,
    DEFAULT_CONFIG_DIR,
)
from .schemas import (
    PathsConfig,
    BaseModelConfig,
    OptimizerParams,
    SchedulerParams,
    TrainerConfig,
    TrainingConfig,
    DatasetConfig,
    KFoldConfig,
    DistillationConfig,
    AblationConfig,
    AblationParameterConfig,
    ExperimentConfig,
    MainAppConfig,
)

__all__ = [
    "ConfigNode", "compose", "load_model_config", "list_model_configs",
    "DEFAULT_CONFIG_DIR", "PathsConfig", "BaseModelConfig", "OptimizerParams",
    "SchedulerParams", "TrainerConfig", "TrainingConfig", "DatasetConfig",
    "KFoldConfig", "DistillationConfig", "AblationConfig",
    "AblationParameterConfig", "ExperimentConfig", "MainAppConfig",
]
