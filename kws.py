#!/usr/bin/env python
"""KWS evaluation CLI (reference entry point src/kws.py)."""
from enhance_cb_whisper_tpu.cli import run_cli

if __name__ == "__main__":
    run_cli()
