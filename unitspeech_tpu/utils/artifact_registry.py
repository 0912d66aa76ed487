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
        # explicit filename: the URL basename is 'km.bin' for every k and
        # would collide in the cache directory
        filename=f"cpc_big_ll6k_km{_k}.bin",
        sha256=_sha,
    )

# hubert-base quantizers (upstream GSLM k-means tables; digests are the
# upstream-published constants — identical by necessity, like the symbol
# table — reference checkpoint_manager/__init__.py:32-55)
for _k, _sha in (
    (50, "d01a7d5bc2c54b7b5f25f321ba525b4d230b06e3927f90bad0394198bc89f494"),
    (100, "f14a3104615485381fc489701d6761c9abbdbb0d43607cf55518a1e2891023fe"),
    (200, "b3c46c9cdd1707ad852dd53c359aa73942e79d53c432a9a8a419ed046408024b"),
    (500, "411c8668e1314751404f58636f935fc73540a6793890435da4a8ffadf157398e"),
):
    register(
        f"hubert-base-ls960-kmeans-{_k}",
        f"https://dl.fbaipublicfiles.com/textless_nlp/gslm/hubert/km{_k}/km.bin",
        filename=f"hubert_base_ls960_km{_k}.bin",
        sha256=_sha,
    )

# Tacotron2 unit-vocoder checkpoints + their code dictionaries (consumed by
# models/tacotron2.py + data/quantize.py; reference
# checkpoint_manager/__init__.py:64-101 (hubert) and :140-176 (cpc)) and the
# shared WaveGlow vocoder (models/waveglow.py; reference :181-187).
_GSLM = "https://dl.fbaipublicfiles.com/textless_nlp/gslm"
for _base, _dir, _k, _sha_tts, _sha_codes in (
    ("hubert-base-ls960", "hubert", 50,
     "335e881a897cfa3389804110de8ac3909159d4de395880fbf1d3167a9477451e",
     "5f01dd57fd3b4044fac93aaac2589bf49e34cbe1dc0713254c0f339ba2123bce"),
    ("hubert-base-ls960", "hubert", 100,
     "b208f8d6433eb5524405aa29d2b5fdacddb63a182d9830b629232e63b3543e4d",
     "6d506216aa5bad159f167e2535293b4e5ec8e1073b64449d30b66b460ebf6da0"),
    ("hubert-base-ls960", "hubert", 200,
     "093f009935a4dadd692db85e859246e369cb17be3aecd22038fb70af4d5b0590",
     "ea01ba3592e27c871b63b32e37d6532234edf7eee7077bdcc094061ee72922e6"),
    ("cpc-big-ll6k", "cpc", 50,
     "e80a46561d1ded73bbe6e7272fcd6b9943fb7607229040b06324f654b66396fd",
     "5f01dd57fd3b4044fac93aaac2589bf49e34cbe1dc0713254c0f339ba2123bce"),
    ("cpc-big-ll6k", "cpc", 100,
     "6cfe1ce4bbdfd0f531189f4013cefc9e1296aec62f8bc0172d68d088ab344a50",
     "a343085a83c1acfc96a2bfecf5098b380e860cdbb832cbcbbb0bf1358bd7c932"),
    ("cpc-big-ll6k", "cpc", 200,
     "5845b1c0a82d9176b9d8c33a32f098795c946077e741a9da2b665bafda17b7ff",
     "48dae50f9f2d4561c4a84fa09ba748395808d7d3323b1d5754af71669117e2aa"),
):
    register(
        f"{_base}-kmeans-{_k}-tacotron",
        f"{_GSLM}/{_dir}/tts_km{_k}/tts_checkpoint_best.pt",
        filename=f"{_base.replace('-', '_')}_kmeans_{_k}_tacotron.pt",
        sha256=_sha_tts,
    )
    register(
        f"{_base}-kmeans-{_k}-tacotron-codes",
        f"{_GSLM}/{_dir}/tts_km{_k}/code_dict",
        filename=f"{_base.replace('-', '_')}_kmeans_{_k}_tacotron_codes.txt",
        sha256=_sha_codes,
    )
register(
    "waveglow",
    f"{_GSLM}/waveglow_256channels_standalone.pt",
    sha256="f383c7fd785502fc6a6bffd604fc14cb35d6155cdde30c53faaaeafa8a904dab",
)

# The 25 names the reference's textlesslib CheckpointManager registers
# (checkpoint_manager/__init__.py:13-187) — all present above with the
# upstream sha256 digests; the UnitSpeech/contentvec artifacts that the
# reference distributes OUTSIDE that manager (Google Drive / HF) are
# registered separately below.
REFERENCE_TEXTLESS_NAMES = (
    ["hubert-base-ls960", "mhubert-base-vp_en_es_fr",
     "mhubert-base-vp_en_es_fr-kmeans-1000", "cpc-big-ll6k", "waveglow"]
    + [f"hubert-base-ls960-kmeans-{k}" for k in (50, 100, 200, 500)]
    + [f"cpc-big-ll6k-kmeans-{k}" for k in (50, 100, 200, 500)]
    + [f"{b}-kmeans-{k}-tacotron{s}"
       for b in ("hubert-base-ls960", "cpc-big-ll6k")
       for k in (50, 100, 200) for s in ("", "-codes")]
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
