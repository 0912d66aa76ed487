#!/usr/bin/env python
"""Base pretrain: text encoder + duration predictor + diffusion decoder.
Thin wrapper over `python -m unitspeech_tpu.cli train-step1` (capability
parity with the reference train_STEP1.py)."""
import sys

from unitspeech_tpu.cli import main_train_step1

if __name__ == "__main__":
    raise SystemExit(main_train_step1(sys.argv[1:]))
