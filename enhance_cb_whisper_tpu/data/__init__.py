from .datasets import (
    ConcatDataset,
    AishellKWSDataset,
    MLSKWSDataset,
    AishellHotwordDataset,
    ACL6060KeywordDataset,
)
from .samplers import KWSSampler
from .collators import KWSDataCollator, HotwordDataCollator
from .datamodule import KWSDataMod, DataLoader

__all__ = [
    "ConcatDataset",
    "AishellKWSDataset",
    "MLSKWSDataset",
    "AishellHotwordDataset",
    "ACL6060KeywordDataset",
    "KWSSampler",
    "KWSDataCollator",
    "HotwordDataCollator",
    "KWSDataMod",
    "DataLoader",
]
