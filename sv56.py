#!/usr/bin/env python
"""Batch sv56 loudness normalization (-26 dBov active speech level).

Entry-point parity with the reference's sv56.py (in dir -> out dir) and
sv56_inplace.py (recursive **/*.wav, in place) — but with the native P.56
implementation (unitspeech_tpu/ops/sv56.py + C++ kernel) instead of shelling
out to the ITU G.191 `sv56demo` binary per file.

  python sv56.py --input-dir wavs/ --output-dir normed/
  python sv56.py --input-dir wavs/ --inplace
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def normalize_file(src: str, dest: str, target_dbov: float, use_native: bool):
    from unitspeech_tpu.data.dataset import load_wav, write_wav
    from unitspeech_tpu.ops import sv56

    wav, sr = load_wav(src)
    if use_native:
        from unitspeech_tpu import native

        level, _ = native.active_speech_level_cpu(wav.astype(np.float32), sr)
        gain = 10.0 ** ((target_dbov - level) / 20.0)
        out = np.clip(wav.astype(np.float64) * gain, -1.0, 1.0).astype(np.float32)
    else:
        out = sv56.normalize(wav, sr, target_dbov)
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    write_wav(dest, out, sr)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-dir", required=True)
    ap.add_argument("--output-dir", default=None)
    ap.add_argument("--inplace", action="store_true")
    ap.add_argument("--target-dbov", type=float, default=-26.0)
    ap.add_argument("--no-native", dest="native", action="store_false",
                    help="use the numpy P.56 path instead of the C++ kernel")
    args = ap.parse_args(argv)
    if not args.inplace and not args.output_dir:
        raise SystemExit("need --output-dir or --inplace")

    from unitspeech_tpu import native as native_mod

    use_native = args.native and native_mod.available()
    files = sorted(glob.glob(os.path.join(args.input_dir, "**", "*.wav"),
                             recursive=True))
    for src in files:
        rel = os.path.relpath(src, args.input_dir)
        dest = src if args.inplace else os.path.join(args.output_dir, rel)
        normalize_file(src, dest, args.target_dbov, use_native)
    print(f"normalized {len(files)} files "
          f"({'native C++' if use_native else 'numpy'} P.56)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
