"""Distributed offline unit transcription.

TPU-native equivalent of the reference's only distributed code
(/root/reference/unitspeech/textlesslib/tools/distributed_transcribe/):
data-parallel unit extraction over a file manifest. The reference uses
torch.distributed with the gloo backend and SLURM/torchrun env plumbing
(distributed.py:25-91); here:

  * process topology comes from `jax.distributed` when launched multi-host,
    or RANK/WORLD_SIZE env vars for plain multi-process CPU runs
  * work sharding is the same strided split (rank, rank+W, rank+2W, ...)
    as transcribe.py:109
  * each rank writes its own shard file; rank 0 merges in manifest order
    (transcribe.py:141-160)
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional, Tuple




def process_topology() -> Tuple[int, int]:
    """(rank, world_size) from jax.distributed if initialized, else env."""
    try:
        import jax

        if jax.process_count() > 1:
            return jax.process_index(), jax.process_count()
    except Exception:
        pass
    return int(os.environ.get("RANK", "0")), int(os.environ.get("WORLD_SIZE", "1"))


def shard_indices(n: int, rank: int, world: int) -> List[int]:
    """Strided split, matching the reference transcribe.py:109."""
    return list(range(rank, n, world))


def transcribe_shard(
    manifest: List[str], indices: List[int], speech_encoder, out_path: str
) -> int:
    """Extract units for this rank's share and write one line per item:
    `<idx>\t<space-separated units>`."""
    from unitspeech_tpu.data.dataset import load_wav

    with open(out_path, "w", encoding="utf-8") as f:
        for idx in indices:
            wav, _sr = load_wav(manifest[idx])
            out = speech_encoder(wav)
            units = " ".join(str(int(u)) for u in out["units"])
            f.write(f"{idx}\t{units}\n")
    return len(indices)


def merge_shards(shard_paths: List[str], out_path: str, n_items: int):
    """Rank-0 merge back into manifest order (transcribe.py:141-160)."""
    lines: List[Optional[str]] = [None] * n_items
    for sp in shard_paths:
        with open(sp, encoding="utf-8") as f:
            for line in f:
                idx, units = line.rstrip("\n").split("\t", 1)
                lines[int(idx)] = units
    missing = [i for i, l in enumerate(lines) if l is None]
    if missing:
        raise RuntimeError(f"missing transcriptions for indices {missing[:10]}...")
    with open(out_path, "w", encoding="utf-8") as f:
        for l in lines:
            f.write(l + "\n")


def main(argv=None):
    ap = argparse.ArgumentParser("unitspeech-tpu distributed-transcribe")
    ap.add_argument("--manifest", required=True, help="one wav path per line")
    ap.add_argument("--output", required=True)
    ap.add_argument("--hubert", required=True)
    ap.add_argument("--kmeans", required=True)
    ap.add_argument("--merge-only", action="store_true")
    args = ap.parse_args(argv)

    with open(args.manifest, encoding="utf-8") as f:
        manifest = [l.strip() for l in f if l.strip()]
    rank, world = process_topology()
    shard_path = f"{args.output}.shard{rank}"

    if not args.merge_only:
        from unitspeech_tpu.models.ssl.hubert import (
            HubertFeatureReader,
            HubertModel,
            mhubert_base_config,
        )
        from unitspeech_tpu.models.ssl.kmeans import KMeansQuantizer
        from unitspeech_tpu.models.ssl.speech_encoder import SpeechEncoder
        from unitspeech_tpu.utils.checkpoint import load_checkpoint

        model = HubertModel(mhubert_base_config())
        params = load_checkpoint(args.hubert)
        quant = KMeansQuantizer.load(args.kmeans)
        enc = SpeechEncoder(HubertFeatureReader(model, params), quant)
        n = transcribe_shard(
            manifest, shard_indices(len(manifest), rank, world), enc, shard_path
        )
        print(f"rank {rank}/{world}: transcribed {n} items -> {shard_path}")

    if rank == 0:
        shards = [f"{args.output}.shard{r}" for r in range(world)]
        if all(os.path.exists(s) for s in shards):
            merge_shards(shards, args.output, len(manifest))
            print(f"merged {world} shards -> {args.output}")
        else:
            print("not all shards present; run with --merge-only once they are")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
