from .checkpoint import CheckpointManager, save_checkpoint, load_checkpoint
from .logging import MetricsLogger
from .kws_engine import KWSEngine

__all__ = [
    "CheckpointManager",
    "save_checkpoint",
    "load_checkpoint",
    "MetricsLogger",
    "KWSEngine",
]
