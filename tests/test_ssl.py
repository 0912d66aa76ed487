"""SSL stack (HuBERT/WavLM), k-means quantizer, process_unit, ECAPA-TDNN
(reference components #10, #11, #13 in SURVEY.md §2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitspeech_tpu.models.speaker import EcapaTdnn
from unitspeech_tpu.models.ssl.feature_extractor import ConvFeatureExtractor
from unitspeech_tpu.models.ssl.hubert import HubertConfig, HubertModel
from unitspeech_tpu.models.ssl.kmeans import (
    KMeansQuantizer,
    dedup_consecutive,
    kmeans_predict,
)
from unitspeech_tpu.models.ssl.transformer import relative_position_bucket
from unitspeech_tpu.models.ssl.wavlm import WavLMConfig, WavLMModel
from unitspeech_tpu.ops.units import process_unit

TINY_CONVS = ((8, 10, 5), (8, 3, 2), (8, 2, 2))  # stride 20, receptive 40


def test_conv_extractor_frame_math():
    fe = ConvFeatureExtractor(TINY_CONVS, "group_norm")
    wav = jnp.zeros((1, 400))
    p = fe.init(jax.random.PRNGKey(0), wav)
    out = fe.apply(p, wav)
    # L1: (400-10)/5+1=79; L2: (79-3)/2+1=39; L3: (39-2)/2+1=19
    assert out.shape == (1, 19, 8)


def test_conv_extractor_layer_norm_mode():
    fe = ConvFeatureExtractor(TINY_CONVS, "layer_norm", conv_bias=True)
    wav = jnp.zeros((1, 400))
    p = fe.init(jax.random.PRNGKey(0), wav)
    assert "norm_2" in p["params"]
    assert fe.apply(p, wav).shape == (1, 19, 8)


def test_relative_position_bucket_properties():
    rel = jnp.arange(-1000, 1001)
    b = np.asarray(relative_position_bucket(rel[None, :], 320, 800))[0]
    assert b.min() >= 0 and b.max() < 320
    # symmetric ranges map to distinct halves
    assert b[0] != b[-1]
    # zero-distance bucket
    assert b[1000] == 160 or b[1000] == 0  # sign convention


def _tiny_hubert():
    cfg = HubertConfig(
        conv_layers=TINY_CONVS, embed_dim=16, num_layers=3, num_heads=2,
        ffn_dim=32, conv_pos=8, conv_pos_groups=2,
    )
    return HubertModel(cfg)


def test_hubert_output_layer_semantics():
    model = _tiny_hubert()
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((1, 400)) * 0.1, jnp.float32)
    p = model.init(jax.random.PRNGKey(0), wav)
    feats6, hidden = model.apply(p, wav, output_layer=2)
    assert len(hidden) == 3  # embedding + 2 layers
    np.testing.assert_array_equal(np.asarray(feats6), np.asarray(hidden[2]))
    full, hidden_all = model.apply(p, wav)
    assert len(hidden_all) == 4
    assert full.shape == (1, 19, 16)


def test_wavlm_runs_with_gated_relpos():
    cfg = WavLMConfig(
        conv_layers=TINY_CONVS, embed_dim=16, num_layers=2, num_heads=2,
        ffn_dim=32, conv_pos=8, conv_pos_groups=2,
    )
    model = WavLMModel(cfg)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((2, 400)) * 0.1, jnp.float32)
    p = model.init(jax.random.PRNGKey(0), wav)
    out, hidden = model.apply(p, wav)
    assert out.shape == (2, 19, 16)
    assert len(hidden) == 3
    assert np.isfinite(np.asarray(out)).all()
    # layer 0 owns the relative attention bias table
    assert "rel_attn_embed" in p["params"]["encoder"]["layer_0"]["self_attn"]
    assert "rel_attn_embed" not in p["params"]["encoder"]["layer_1"]["self_attn"]


def test_kmeans_predict_matches_bruteforce():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((50, 8)).astype(np.float32)
    cents = rng.standard_normal((10, 8)).astype(np.float32)
    got = np.asarray(kmeans_predict(jnp.asarray(feats), jnp.asarray(cents)))
    want = np.argmin(
        ((feats[:, None, :] - cents[None, :, :]) ** 2).sum(-1), axis=1
    )
    np.testing.assert_array_equal(got, want)


def test_kmeans_quantizer_roundtrip(tmp_path):
    q = KMeansQuantizer(np.eye(4, 6, dtype=np.float32))
    path = str(tmp_path / "km.npz")
    q.save(path)
    q2 = KMeansQuantizer.load(path)
    assert q2.vocab_size == 4
    feats = np.eye(4, 6, dtype=np.float32)[[2, 2, 0]]
    np.testing.assert_array_equal(q2(feats), [2, 2, 0])


def test_dedup_consecutive():
    units, counts = dedup_consecutive(np.array([5, 5, 5, 2, 2, 7, 5]))
    np.testing.assert_array_equal(units, [5, 2, 7, 5])
    np.testing.assert_array_equal(counts, [3, 2, 1, 1])
    u, c = dedup_consecutive(np.array([], np.int64))
    assert len(u) == 0 and len(c) == 0


def test_process_unit_matches_reference_loop():
    """Oracle: direct transliteration of util.py:69-102 with torch.mode."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    n = 12
    units = rng.integers(0, 5, n)
    durations = rng.integers(1, 4, n)
    sr, hop = 16000, 256

    # oracle
    dur = [int(d) * (sr // 50) for d in durations]
    expand = []
    for u, d in zip(units.tolist(), dur):
        expand.extend([int(u)] * d)
    new_len = len(expand) // hop * hop
    modes = torch.LongTensor(expand)[:new_len].reshape(-1, hop).mode(1)[0].tolist()
    squeezed_u, squeezed_d = [modes[0]], [1]
    for u in modes[1:]:
        if u == squeezed_u[-1]:
            squeezed_d[-1] += 1
        else:
            squeezed_u.append(u)
            squeezed_d.append(1)

    got_u, got_d = process_unit(units, durations, sr, hop)
    np.testing.assert_array_equal(got_u, squeezed_u)
    np.testing.assert_array_equal(got_d, squeezed_d)
    assert got_d.sum() == new_len // hop


def test_ecapa_embedding_shape():
    model = EcapaTdnn(feat_dim=16, channels=16, emb_dim=8, n_hidden_states=3)
    hidden = jnp.asarray(
        np.random.default_rng(0).standard_normal((3, 2, 30, 16)), jnp.float32
    )
    p = model.init(jax.random.PRNGKey(0), hidden)
    emb = model.apply(p, hidden)
    assert emb.shape == (2, 8)
    assert np.isfinite(np.asarray(emb)).all()
    assert "batch_stats" in p  # BatchNorms use running statistics
