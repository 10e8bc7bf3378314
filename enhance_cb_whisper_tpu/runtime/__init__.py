from .checkpoint import CheckpointManager, save_checkpoint, load_checkpoint
from .logging import MetricsLogger
from .kws_engine import KWSEngine
from .serving import TranscriptionService

__all__ = [
    "CheckpointManager",
    "save_checkpoint",
    "load_checkpoint",
    "MetricsLogger",
    "KWSEngine",
    "TranscriptionService",
]
