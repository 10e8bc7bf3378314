#!/usr/bin/env python
"""KWS training CLI (reference entry point src/run_CLI.py)."""
from enhance_cb_whisper_tpu.cli import run_cli

if __name__ == "__main__":
    run_cli()
