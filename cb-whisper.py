#!/usr/bin/env python
"""CB-Whisper end-to-end evaluation CLI (reference entry point src/cb-whisper.py)."""
from enhance_cb_whisper_tpu.cli import run_cli

if __name__ == "__main__":
    run_cli()
