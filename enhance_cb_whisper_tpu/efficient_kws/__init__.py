from .model import EfficientKWSConfig, EfficientKWSModel

__all__ = ["EfficientKWSConfig", "EfficientKWSModel"]
