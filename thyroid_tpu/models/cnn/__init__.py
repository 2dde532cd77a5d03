from .resnet import ResNet, RESNET_PARAMS, build_resnet, BasicBlock, Bottleneck
from .densenet import DenseNet, DENSENET_PARAMS, build_densenet
from .efficientnet import EfficientNet, EFFICIENTNET_PARAMS, build_efficientnet
from .inception import InceptionV3, InceptionV4, build_inception

__all__ = [
    "ResNet", "RESNET_PARAMS", "build_resnet", "BasicBlock", "Bottleneck",
    "DenseNet", "DENSENET_PARAMS", "build_densenet",
    "EfficientNet", "EFFICIENTNET_PARAMS", "build_efficientnet",
    "InceptionV3", "InceptionV4", "build_inception",
]
