from .logits_process import LogitsProcessorConfig, apply_logits_processors
from .beam import beam_search, greedy_search
from .generate import WhisperGenerator, GenerationOptions

__all__ = [
    "LogitsProcessorConfig",
    "apply_logits_processors",
    "beam_search",
    "greedy_search",
    "WhisperGenerator",
    "GenerationOptions",
]
