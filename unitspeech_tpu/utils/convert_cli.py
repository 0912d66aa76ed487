"""Checkpoint conversion CLI: reference torch .pt -> native orbax.

    python -m unitspeech_tpu.utils.convert_cli decoder pretrained_decoder.pt out/decoder
    python -m unitspeech_tpu.utils.convert_cli text-encoder text_encoder.pt out/te
    python -m unitspeech_tpu.utils.convert_cli unit-encoder unit_encoder.pt out/ue
    python -m unitspeech_tpu.utils.convert_cli contentvec-encoder cv_encoder.pt out/cv
    python -m unitspeech_tpu.utils.convert_cli duration-predictor duration_predictor.pt out/dp
    python -m unitspeech_tpu.utils.convert_cli vocoder bigvgan.pt out/voc
    python -m unitspeech_tpu.utils.convert_cli hubert mhubert_base.pt out/hubert
    python -m unitspeech_tpu.utils.convert_cli speaker-embedder speaker_encoder.pt out/spk
    python -m unitspeech_tpu.utils.convert_cli kmeans kmeans.bin out/kmeans.npz

Loading the torch files directly also works everywhere (utils/artifacts.py
converts on the fly); this CLI persists the converted orbax form so torch is
not needed at serving time.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser("unitspeech-tpu convert")
    ap.add_argument("kind", choices=[
        "decoder", "text-encoder", "unit-encoder", "contentvec-encoder",
        "duration-predictor", "vocoder", "hubert", "wavlm",
        "speaker-embedder", "kmeans",
    ])
    ap.add_argument("src", help="torch .pt/.bin checkpoint")
    ap.add_argument("dest", help="output orbax directory (or .npz for kmeans)")
    ap.add_argument("--config", default=None, help="JSON config overlay")
    args = ap.parse_args(argv)

    import numpy as np

    from unitspeech_tpu.config import MainConfig, load_json

    cfg = load_json(args.config) if args.config else MainConfig()

    if args.kind == "kmeans":
        from unitspeech_tpu.models.ssl.kmeans import KMeansQuantizer
        from unitspeech_tpu.utils.torch_convert_ssl import convert_sklearn_kmeans

        KMeansQuantizer(convert_sklearn_kmeans(args.src)).save(args.dest)
        print(f"wrote {args.dest}")
        return 0

    from unitspeech_tpu.utils import artifacts
    from unitspeech_tpu.utils.checkpoint import save_checkpoint

    if args.kind == "decoder":
        bundle = artifacts.load_decoder_bundle(args.src, cfg.decoder)
        out = artifacts.save_decoder_bundle(args.dest, bundle.step, bundle)
    elif args.kind in ("text-encoder", "unit-encoder", "contentvec-encoder"):
        sub = {
            "text-encoder": cfg.text_encoder,
            "unit-encoder": cfg.unit_encoder,
            "contentvec-encoder": cfg.contentvec_encoder,
        }[args.kind]
        params = artifacts.load_encoder_params(
            args.src, sub, contentvec=args.kind == "contentvec-encoder"
        )
        out = save_checkpoint(args.dest, 0, params)
    elif args.kind == "duration-predictor":
        out = save_checkpoint(args.dest, 0, artifacts.load_duration_predictor_params(args.src))
    elif args.kind == "vocoder":
        out = save_checkpoint(args.dest, 0, artifacts.load_vocoder_params(args.src, cfg.vocoder))
    elif args.kind == "hubert":
        import torch

        from unitspeech_tpu.utils.torch_convert_ssl import convert_hubert

        obj = torch.load(args.src, map_location="cpu", weights_only=False)
        sd = obj.get("model", obj)
        sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
              for k, v in sd.items() if hasattr(v, "detach") or isinstance(v, np.ndarray)}
        out = save_checkpoint(args.dest, 0, convert_hubert(sd))
    elif args.kind == "wavlm":
        import torch

        from unitspeech_tpu.utils.torch_convert_ssl import convert_wavlm

        obj = torch.load(args.src, map_location="cpu", weights_only=False)
        sd = obj.get("model", obj)
        sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
        out = save_checkpoint(args.dest, 0, convert_wavlm(sd))
    elif args.kind == "speaker-embedder":
        import torch

        from unitspeech_tpu.utils.torch_convert_ssl import convert_speaker_embedder

        obj = torch.load(args.src, map_location="cpu", weights_only=True)
        sd = obj.get("model", obj)
        sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
        out = save_checkpoint(args.dest, 0, convert_speaker_embedder(sd))
    else:  # pragma: no cover
        raise SystemExit(f"unhandled kind {args.kind}")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
