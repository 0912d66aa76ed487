"""CPC feature reader: output-level parity vs the REAL reference torch stack
(/root/reference/unitspeech/textlesslib/textless/data/cpc_feature_reader.py)
plus chunking-contract tests for the host wrapper."""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests._reference import load_reference_cpc  # noqa: E402
from unitspeech_tpu.models.ssl.cpc import (  # noqa: E402
    CpcConfig,
    CpcFeatureReader,
    CpcModel,
    convert_cpc,
)

REF = load_reference_cpc()
pytestmark = pytest.mark.skipif(REF is None, reason="reference not available")

CFG = CpcConfig(hidden_encoder=16, hidden_gar=12, n_levels_lstm=2)


def _make_pair(seed=0):
    torch.manual_seed(seed)
    enc = REF.CPCEncoder(CFG.hidden_encoder)
    ar = REF.CPCAR(CFG.hidden_encoder, CFG.hidden_gar, False,
                   CFG.n_levels_lstm)
    ref = REF.CPCModel(enc, ar).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    ours = CpcModel(CFG)
    params = convert_cpc(sd, CFG)
    return ref, ours, params


@pytest.mark.parametrize("get_encoded,norm_output", [
    (False, False), (True, False), (False, True),
])
def test_cpc_extract_features_parity(get_encoded, norm_output):
    ref, ours, params = _make_pair()
    rng = np.random.default_rng(1)
    wav = rng.standard_normal(3200).astype(np.float32) * 0.1

    with torch.inference_mode():
        want = ref.extract_features(
            torch.from_numpy(wav).view(1, 1, -1),
            get_encoded=get_encoded, norm_output=norm_output,
        ).numpy()[0]
    got = np.asarray(ours.apply(
        params, jnp.asarray(wav[None]), get_encoded=get_encoded,
        norm_output=norm_output,
    ))[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_cpc_reader_chunking_matches_reference():
    """The wrapper's full-window + right-aligned-tail chunking must yield the
    same frame sequence as the reference reader (cpc_feature_reader.py:31-59)
    for a non-multiple length."""
    ref, ours, params = _make_pair(seed=2)

    # reference reader without its checkpoint-loading __init__
    rref = REF.CpcFeatureReader.__new__(REF.CpcFeatureReader)
    torch.nn.Module.__init__(rref)
    rref.model = ref
    rref.max_chunk = 1600
    rref.norm_features = False
    rref.use_encoder_layer = False

    reader = CpcFeatureReader(CpcModel(CFG), params, max_chunk=1600)

    rng = np.random.default_rng(3)
    wav = rng.standard_normal(4000).astype(np.float32) * 0.1  # 2 full + tail
    want = rref.get_features(torch.from_numpy(wav)).numpy()
    got = reader(wav)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_cpc_reader_short_input():
    _, ours, params = _make_pair(seed=4)
    reader = CpcFeatureReader(CpcModel(CFG), params, max_chunk=1600)
    wav = np.random.default_rng(5).standard_normal(800).astype(np.float32)
    feats = reader(wav)
    assert feats.shape == (800 // 160, CFG.hidden_gar)
    assert np.isfinite(feats).all()


def test_cpc_reader_hop_and_rate():
    _, ours, params = _make_pair(seed=6)
    reader = CpcFeatureReader(CpcModel(CFG), params)
    assert reader.code_hop_size == 160
    assert reader.expected_sample_rate == 16_000


def test_speech_encoder_with_cpc_reader():
    """SpeechEncoder (units/durations/dense contract) over the CPC dense
    family, mirroring the reference DENSE_MODELS registry entry
    (textless/__init__.py: 'cpc-big-ll6k' -> CpcFeatureReader)."""
    from unitspeech_tpu.models.ssl.kmeans import KMeansQuantizer
    from unitspeech_tpu.models.ssl.speech_encoder import SpeechEncoder

    _, ours, params = _make_pair(seed=7)
    reader = CpcFeatureReader(CpcModel(CFG), params, max_chunk=1600)
    rng = np.random.default_rng(8)
    centers = rng.standard_normal((4, CFG.hidden_gar)).astype(np.float32)
    enc = SpeechEncoder(reader, KMeansQuantizer(centers), deduplicate=True)
    out = enc(rng.standard_normal(3200).astype(np.float32) * 0.1)
    assert out["units"].shape == out["durations"].shape
    assert int(out["durations"].sum()) == out["dense"].shape[0] == 20
    assert enc.code_hop_size == 160
