"""Pretrained-artifact registry: name -> (URL, sha256), lazy download + cache.

Equivalent of textlesslib's CheckpointManager
(/root/reference/unitspeech/textlesslib/textless/checkpoint_manager/
manager.py:23-65): artifacts are fetched once into a cache directory and
sha256-verified. The registry ships the names the reference pipeline needs;
URLs/digests can be overlaid from a JSON file for air-gapped mirrors.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import urllib.request
from dataclasses import dataclass
from typing import Dict, Optional

DEFAULT_CACHE = os.path.expanduser("~/.cache/unitspeech_tpu")


@dataclass(frozen=True)
class Artifact:
    name: str
    url: str
    sha256: Optional[str] = None
    filename: Optional[str] = None


# The artifact set the reference pipeline consumes (README.md:53-100 and the
# textlesslib registry). URLs intentionally point at the canonical upstream
# hosts; converted-to-JAX mirrors can be overlaid via register_from_json.
REGISTRY: Dict[str, Artifact] = {}


def register(name: str, url: str, sha256: Optional[str] = None,
             filename: Optional[str] = None):
    REGISTRY[name] = Artifact(name, url, sha256, filename)


def register_from_json(path: str):
    with open(path) as f:
        for name, spec in json.load(f).items():
            register(name, spec["url"], spec.get("sha256"), spec.get("filename"))


# SSL artifacts with upstream-published sha256 digests (the reference pins
# the same digests, checkpoint_manager/__init__.py:13+).
register(
    "mhubert-base-vp_en_es_fr",
    "https://dl.fbaipublicfiles.com/hubert/mhubert_base_vp_en_es_fr_it3.pt",
    sha256="23527cd6311a6617bfa199f574e2eed478cd6a58a634f4007165c10ec0019832",
)
register(
    "mhubert-base-vp_en_es_fr-kmeans-1000",
    "https://dl.fbaipublicfiles.com/hubert/mhubert_base_vp_en_es_fr_it3_L11_km1000.bin",
    sha256="c70f5416c38044d0c20e33fdeedf4533974a8ac4029985cdef3b755038381a0b",
)
register(
    "hubert-base-ls960",
    "https://dl.fbaipublicfiles.com/hubert/hubert_base_ls960.pt",
    sha256="1703cf8d2cdc76f8c046f5f6a9bcd224e0e6caf4744cad1a1f4199c32cac8c8d",
)
register(
    "cpc-big-ll6k",
    "https://dl.fbaipublicfiles.com/textless_nlp/gslm/cpc/cpc_big_ll6kh_top_ctc.pt",
    sha256="73155dad5d7c986fe7b7f548050060a8e9cc9a0ffd111a22932f38c3e617c5b8",
)
for _k, _sha in (
    (50, "c48be5717aebc08169aa5165d58267449b8c8568624a346bb9f4b26eac3b0240"),
    (100, "077b96e010b1e87be627ef2bef0f5e5cdaa1c01722aa363b2dc0bb6a638e8b26"),
    (200, "2d863d1c6f251d19e667998248c87642ecb5e3ffaa410e9ebfa64341db4f6de2"),
    (500, "35398f665dff06801a7bf1e595bc176711ed751d554e64d999dc42f1dd106561"),
):
    register(
        f"cpc-big-ll6k-kmeans-{_k}",
        f"https://dl.fbaipublicfiles.com/textless_nlp/gslm/cpc/km{_k}/km.bin",
        sha256=_sha,
    )

# UnitSpeech checkpoints: the reference distributes them via a Google Drive
# folder (README.md:55) with NO published digests — URLs are the canonical
# Drive file IDs; pin digests locally after the first verified download by
# overlaying register_from_json. bigvgan/speaker_encoder/contentvec likewise.
_DRIVE = "https://drive.google.com/uc?export=download&id="
for _name, _fid in {
    "unitspeech-text-encoder": "text_encoder.pt",
    "unitspeech-unit-encoder": "unit_encoder.pt",
    "unitspeech-duration-predictor": "duration_predictor.pt",
    "unitspeech-pretrained-decoder": "pretrained_decoder.pt",
    "unitspeech-speaker-encoder": "speaker_encoder.pt",
    "unitspeech-bigvgan": "bigvgan.pt",
    "unitspeech-bigvgan-config": "bigvgan-config.json",
}.items():
    # the Drive folder (1yFkb2TAYB_zMmoTuUOXu-zXb3UI9pVJ9) does not expose
    # stable per-file IDs programmatically; the URL records the folder and
    # the filename so a mirror overlay can slot in a direct link
    register(
        _name,
        "https://drive.google.com/drive/folders/"
        f"1yFkb2TAYB_zMmoTuUOXu-zXb3UI9pVJ9#{_fid}",
        filename=_fid,
    )
register(
    "contentvec-best",
    "https://huggingface.co/lengyue233/content-vec-best/resolve/main/pytorch_model.bin",
    filename="content-vec-best.bin",
)


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


class CheckpointManager:
    def __init__(self, cache_dir: str = DEFAULT_CACHE):
        self.cache_dir = cache_dir

    def path_for(self, name: str) -> str:
        art = REGISTRY.get(name)
        if art is None:
            raise KeyError(f"unknown artifact {name!r}; known: {sorted(REGISTRY)}")
        fname = art.filename or os.path.basename(art.url)
        return os.path.join(self.cache_dir, fname)

    def get(self, name: str, download: bool = True) -> str:
        """Return a local path for `name`, fetching and verifying if needed."""
        art = REGISTRY[name] if name in REGISTRY else None
        if art is None:
            raise KeyError(f"unknown artifact {name!r}; known: {sorted(REGISTRY)}")
        dest = self.path_for(name)
        if os.path.exists(dest):
            if art.sha256 and _sha256(dest) != art.sha256:
                raise IOError(f"{dest}: sha256 mismatch; delete and re-fetch")
            return dest
        if not download:
            raise FileNotFoundError(dest)
        os.makedirs(self.cache_dir, exist_ok=True)
        tmp = dest + ".part"
        urllib.request.urlretrieve(art.url, tmp)
        if art.sha256 and _sha256(tmp) != art.sha256:
            os.unlink(tmp)
            raise IOError(f"{art.url}: sha256 mismatch after download")
        shutil.move(tmp, dest)
        return dest

    def add_local(self, name: str, path: str) -> str:
        """Install a manually-obtained file under the registry name."""
        dest = self.path_for(name) if name in REGISTRY else os.path.join(
            self.cache_dir, os.path.basename(path)
        )
        os.makedirs(self.cache_dir, exist_ok=True)
        shutil.copyfile(path, dest)
        return dest
