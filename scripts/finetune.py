#!/usr/bin/env python
"""Upstream-API fine-tune entry point (reference scripts/finetune.py —
the argparse+JSON variant of the root finetune.py; both run the same
pipeline here). Thin wrapper over `python -m unitspeech_tpu.cli finetune`."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unitspeech_tpu.cli import main_finetune

if __name__ == "__main__":
    raise SystemExit(main_finetune(sys.argv[1:]))
