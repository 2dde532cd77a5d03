from .registry import ModelRegistry, cfg_get
from .layers import (
    DropPath, Mlp, Attention, PatchEmbed, Block, sincos_pos_embed,
    count_params, trunc_normal_init,
)
from .base import init_model, create_and_init, num_parameters, forward
from . import cnn  # noqa: F401 — registers resnet/densenet/efficientnet/inception
from . import vit  # noqa: F401 — registers vit/deit/swin families
from . import ensemble  # noqa: F401 — registers cnn_ensemble
from .cnn import ResNet, DenseNet, EfficientNet, InceptionV3, InceptionV4
from .vit import VisionTransformer, DeiT, SwinTransformer
from .ensemble import CNNEnsemble

__all__ = [
    "ModelRegistry", "cfg_get", "DropPath", "Mlp", "Attention", "PatchEmbed",
    "Block", "sincos_pos_embed", "count_params", "trunc_normal_init",
    "init_model", "create_and_init", "num_parameters", "forward",
    "ResNet", "DenseNet", "EfficientNet", "InceptionV3", "InceptionV4",
    "VisionTransformer", "DeiT", "SwinTransformer", "CNNEnsemble",
]
