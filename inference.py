#!/usr/bin/env python
"""Adaptive TTS synthesis from a (fine-tuned) decoder checkpoint.
Thin wrapper over `python -m unitspeech_tpu.cli inference` (capability parity
with the reference inference.py / scripts/text_to_speech.py)."""
import sys

from unitspeech_tpu.cli import main_inference

if __name__ == "__main__":
    raise SystemExit(main_inference(sys.argv[1:]))
