#!/usr/bin/env python
"""efficient_kws training/eval CLI (reference entry point src/run_efficient_kws.py)."""
from enhance_cb_whisper_tpu.cli import run_cli

if __name__ == "__main__":
    run_cli()
