from .config import load_config, apply_overrides
from .main import run_cli

__all__ = ["load_config", "apply_overrides", "run_cli"]
