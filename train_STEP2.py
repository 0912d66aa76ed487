#!/usr/bin/env python
"""Unit-encoder training against a frozen decoder.
Thin wrapper over `python -m unitspeech_tpu.cli train-step2` (capability
parity with the reference train_STEP2.py)."""
import sys

from unitspeech_tpu.cli import main_train_step2

if __name__ == "__main__":
    raise SystemExit(main_train_step2(sys.argv[1:]))
