#!/usr/bin/env python
"""Manual data-pipeline harness: instantiate a dataset + collator and print a
sample batch (equivalent of the reference's
scripts_custom/validate_dataloader.py).

Usage:
  python scripts/validate_dataloader.py --filelist train.txt [--units]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--filelist", required=True)
    ap.add_argument("--units", action="store_true", help="unit-mel dataset (STEP2)")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--language", default="en-us")
    args = ap.parse_args(argv)

    from unitspeech_tpu import text as text_frontend
    from unitspeech_tpu.data.dataset import (
        BucketCollator,
        TextMelSpeakerDataset,
        UnitMelSpeakerDataset,
        iterate_batches,
        parse_filelist,
    )

    filelist = parse_filelist(args.filelist)
    print(f"{len(filelist)} entries in {args.filelist}")

    if args.units:
        dataset = UnitMelSpeakerDataset(filelist)
    else:
        ph = text_frontend.get_phonemizer(args.language)

        def text_to_ids(t):
            if ph is None:
                return text_frontend.phonemes_to_sequence(t)
            return text_frontend.text_to_sequence(t, ph)

        dataset = TextMelSpeakerDataset(filelist, text_to_ids)

    item = dataset[0]
    print("item[0]:")
    for k, v in item.items():
        print(f"  {k}: shape={np.shape(v)} dtype={np.asarray(v).dtype}")

    collator = BucketCollator()
    batch = next(iterate_batches(dataset, collator, args.batch_size, shuffle=False))
    print(f"batch (size {args.batch_size}):")
    for k, v in batch.items():
        print(f"  {k}: shape={np.shape(v)} dtype={np.asarray(v).dtype}")
    wav = batch["wav"]
    print(f"  wav range: [{wav.min():.3f}, {wav.max():.3f}]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
