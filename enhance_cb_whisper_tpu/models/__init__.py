from .resnet import ResNet, ResNetConfig, ResNetClassifier
from .kws import KWSModel, KWSOutput

__all__ = ["ResNet", "ResNetConfig", "ResNetClassifier", "KWSModel", "KWSOutput"]
