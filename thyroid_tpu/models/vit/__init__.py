from .vit import (
    VisionTransformer, VIT_PARAMS, build_vit,
    create_vit_tiny, create_vit_small, create_vit_base,
)
from .deit import DeiT, DEIT_PARAMS, build_deit
from .swin import (
    SwinTransformer, SwinBlock, SwinStage, WindowAttention, PatchMerging,
    SWIN_PARAMS, build_swin, window_partition, window_reverse,
    create_swin_tiny, create_swin_medical,
)

__all__ = [
    "VisionTransformer", "VIT_PARAMS", "build_vit", "create_vit_tiny",
    "create_vit_small", "create_vit_base", "DeiT", "DEIT_PARAMS", "build_deit",
    "SwinTransformer", "SwinBlock", "SwinStage", "WindowAttention",
    "PatchMerging", "SWIN_PARAMS", "build_swin", "window_partition",
    "window_reverse", "create_swin_tiny", "create_swin_medical",
]
