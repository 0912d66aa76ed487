#!/usr/bin/env python
"""Speaker-adaptive fine-tuning of the diffusion decoder.
Thin wrapper over `python -m unitspeech_tpu.cli finetune` (capability parity
with the reference finetune.py / scripts/finetune.py)."""
import sys

from unitspeech_tpu.cli import main_finetune

if __name__ == "__main__":
    raise SystemExit(main_finetune(sys.argv[1:]))
