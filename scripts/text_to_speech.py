#!/usr/bin/env python
"""Standalone TTS (reference scripts/text_to_speech.py equivalent)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unitspeech_tpu.cli import main_inference

if __name__ == "__main__":
    raise SystemExit(main_inference(sys.argv[1:]))
