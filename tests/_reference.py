"""Import the REAL reference torch modules from /root/reference for
output-level parity testing (VERDICT round-1 item #1).

The reference's import chain pulls heavy optional deps (librosa, phonemizer,
fairseq, s3prl, torchaudio) at module scope but only uses them inside
functions we never call; stub just enough of them in sys.modules so the
model classes (Encoder, DurationPredictor, UnitSpeech, BigVGAN) import.

conf.hydra_config is also stubbed: its dataclasses use hydra/omegaconf
mutable-default semantics that plain `dataclasses` rejects on this Python,
and unitspeech.util only imports two config *names* from it.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        import importlib.machinery

        mod = types.ModuleType(name)
        # a bare ModuleType has __spec__ None, which makes OTHER packages'
        # importlib.util.find_spec(name) probes raise ValueError (observed:
        # transformers probing librosa after a reference-parity test stubbed
        # it) — give every stub a real ModuleSpec
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        mod.__unitspeech_test_stub__ = True
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def load_reference():
    """Returns a namespace with the reference model classes, or None if the
    reference checkout is unavailable."""
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "unitspeech")):
        return None

    lib = _stub("librosa")
    lib.filters = _stub("librosa.filters")
    _stub("phonemizer")
    _stub(
        "unitspeech.speaker_encoder.ecapa_tdnn",
        ECAPA_TDNN=object,
        ECAPA_TDNN_SMALL=object,
    )
    _stub(
        "unitspeech.textlesslib.textless.data.speech_encoder",
        SpeechEncoder=object,
    )

    class _Cfg:  # placeholder config types (never instantiated by the models)
        pass

    _stub("conf")
    _stub("conf.hydra_config", SpeakerEmbedderCfg=_Cfg, UnitExtractorConfig=_Cfg)

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    from unitspeech.duration_predictor import DurationPredictor
    from unitspeech.encoder import Encoder
    from unitspeech.unitspeech import GradLogPEstimator2d, UnitSpeech
    from unitspeech.vocoder.env import AttrDict
    from unitspeech.vocoder.models import BigVGAN

    ns = types.SimpleNamespace(
        Encoder=Encoder,
        DurationPredictor=DurationPredictor,
        GradLogPEstimator2d=GradLogPEstimator2d,
        UnitSpeech=UnitSpeech,
        BigVGAN=BigVGAN,
        AttrDict=AttrDict,
    )
    return ns


def load_reference_ecapa():
    """Import the REAL reference ECAPA_TDNN (ecapa_tdnn.py:164-287) for
    output-level parity. Its module-scope deps (torchaudio.transforms, the
    s3prl UpstreamExpert) are stubbed — the parity test replaces the SSL
    upstream with synthetic hidden states anyway. Returns the module or None."""
    if load_reference() is None:
        return None

    ta = _stub("torchaudio")
    ta.transforms = _stub("torchaudio.transforms", MelSpectrogram=object, MFCC=object)
    _stub("unitspeech.speaker_encoder.utils", UpstreamExpert=object)

    # load_reference() installed a placeholder for this module; swap in the
    # real file (the package itself is importable — empty __init__)
    name = "unitspeech.speaker_encoder.ecapa_tdnn"
    existing = sys.modules.get(name)
    if getattr(existing, "__unitspeech_test_stub__", False):  # our placeholder
        del sys.modules[name]
    import importlib

    return importlib.import_module(name)


def load_reference_cpc():
    """Import the REAL reference CPC stack (cpc_feature_reader.py:11-190)
    for output-level parity. The module depends only on torch; textlesslib's
    data package __init__ is empty, so no stubbing is needed."""
    if load_reference() is None:
        return None
    # the textless package __init__ imports the full model registry (fairseq
    # etc.); load the single self-contained file instead
    import importlib.util

    path = os.path.join(
        REFERENCE_ROOT,
        "unitspeech/textlesslib/textless/data/cpc_feature_reader.py",
    )
    spec = importlib.util.spec_from_file_location("_ref_cpc", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_reference_tacotron():
    """Import the REAL reference Tacotron2/WaveGlow unit-vocoder stack
    (textless/vocoders/tacotron2/{model,glow,stft,text,tts_data}.py) for
    output-level parity.

    The files are loaded as a synthetic package `_ref_taco` whose __path__
    points at the reference directory — the real package __init__ pulls the
    checkpoint manager (network) so it must not run. librosa/soundfile/
    unidecode are stubbed with just enough behavior for the code paths the
    models execute (window padding + sumsquare normalization in stft.py)."""
    if load_reference() is None:
        return None
    import importlib

    import numpy as np

    def _pad_center(data, size=None, **kw):
        size = kw.get("size", size)
        n = len(data)
        lpad = (size - n) // 2
        return np.pad(data, (lpad, size - n - lpad))

    lib = _stub("librosa")
    util = _stub("librosa.util")
    util.pad_center = _pad_center
    util.tiny = lambda x: np.finfo(
        x.dtype if hasattr(x, "dtype") else np.float32).tiny
    util.normalize = lambda x, norm=None, **kw: (
        x if norm is None else x / np.max(np.abs(x)))
    lib.util = util
    filters = _stub("librosa.filters")
    filters.mel = lambda *a, **kw: np.zeros((1, 1), np.float32)
    lib.filters = filters
    _stub("soundfile")
    _stub("unidecode", unidecode=lambda s: s)
    _stub("inflect", engine=lambda: None)

    name = "_ref_taco"
    if name not in sys.modules:
        pkg = types.ModuleType(name)
        pkg.__path__ = [os.path.join(
            REFERENCE_ROOT,
            "unitspeech/textlesslib/textless/vocoders/tacotron2")]
        sys.modules[name] = pkg
    ns = types.SimpleNamespace()
    for sub in ("model", "glow", "stft", "text", "tts_data"):
        setattr(ns, sub, importlib.import_module(f"{name}.{sub}"))
    return ns
