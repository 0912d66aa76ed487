#!/usr/bin/env python
"""Unit/contentvec-based voice conversion.
Thin wrapper over `python -m unitspeech_tpu.cli voice-conversion` (capability
parity with the reference scripts/voice_conversion.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unitspeech_tpu.cli import main_voice_conversion

if __name__ == "__main__":
    raise SystemExit(main_voice_conversion(sys.argv[1:]))
