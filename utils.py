#!/usr/bin/env python
"""Dataset-build utilities CLI (reference entry point src/utils.py)."""
from enhance_cb_whisper_tpu.pipeline import main

if __name__ == "__main__":
    main()
