"""Tacotron2 unit-vocoder acoustic model: output-level parity vs the REAL
reference torch module (/root/reference/unitspeech/textlesslib/textless/
vocoders/tacotron2/model.py:43-702) plus padded-bucket invariance for the
TPU-native while_loop decoder."""

from __future__ import annotations

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests._reference import load_reference_tacotron  # noqa: E402
from unitspeech_tpu.infer.unit_vocoder import (  # noqa: E402
    TacotronInput,
    code_to_sequence,
    load_code_dict,
)
from unitspeech_tpu.models.tacotron2 import (  # noqa: E402
    convert_tacotron2,
    encoder_infer,
    tacotron2_infer,
    tacotron2_test_config,
)

REF = load_reference_tacotron()
pytestmark = pytest.mark.skipif(REF is None, reason="reference not available")


def _hparams(cfg):
    """Our config -> the reference's hparams namespace (model.py reads these
    attributes; dropout ps only matter in train mode)."""
    return types.SimpleNamespace(
        mask_padding=False, fp16_run=False,
        p_attention_dropout=0.1, p_decoder_dropout=0.1,
        **cfg.__dict__,
    )


def _make_pair(cfg, seed=0):
    torch.manual_seed(seed)
    ref = REF.model.Tacotron2(_hparams(cfg)).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_tacotron2(sd, cfg)
    return ref, params


def _patched_dropout():
    """The reference Prenet passes training=True even at eval
    (model.py:130-133); disable it for determinism in BOTH frameworks (ours
    via prenet_dropout=False)."""

    class _Ctx:
        def __enter__(self):
            self._orig = REF.model.F.dropout
            REF.model.F.dropout = lambda x, p=0.5, training=False: x

        def __exit__(self, *a):
            REF.model.F.dropout = self._orig

    return _Ctx()


@pytest.mark.parametrize("gate_threshold,expect_eos", [
    (1.1, False),   # gate never fires -> decode to max_decoder_steps
    (0.0, True),    # gate fires at step 1
])
def test_tacotron2_inference_parity(gate_threshold, expect_eos):
    cfg = tacotron2_test_config(gate_threshold=gate_threshold)
    ref, params = _make_pair(cfg)
    tokens = np.array([[1, 3, 5, 7, 2, 4, 6, 1, 9]], np.int32)

    with _patched_dropout(), torch.inference_mode():
        mel_r, mel_post_r, gate_r, align_r, has_eos_r = ref.inference(
            torch.from_numpy(tokens).long(), ret_has_eos=True)

    mels, mel_post, gates, aligns, n_steps, has_eos = tacotron2_infer(
        params, cfg, jnp.asarray(tokens),
        jnp.asarray([tokens.shape[1]], np.int32), prenet_dropout=False)
    n = int(n_steps[0])

    assert bool(has_eos[0]) == bool(has_eos_r) == expect_eos
    assert n == mel_r.shape[-1]
    np.testing.assert_allclose(
        np.asarray(mels)[0, :n], mel_r.numpy()[0].T, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(mel_post)[0, :n], mel_post_r.numpy()[0].T,
        atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(gates)[0, :n], gate_r.numpy().reshape(-1)[:n], atol=5e-4,
        rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(aligns)[0, :n], align_r.numpy().reshape(n, -1),
        atol=5e-4, rtol=1e-3)


def test_tacotron2_obs_embedding_parity():
    """obs_dim > 0 concatenates a label embedding into both RNN/projection
    inputs (model.py:330-340, 575-596)."""
    cfg = tacotron2_test_config(gate_threshold=1.1, obs_dim=4, obs_n_class=3,
                                max_decoder_steps=12)
    ref, params = _make_pair(cfg, seed=1)
    tokens = np.array([[2, 4, 6, 8]], np.int32)
    obs = np.array([1], np.int64)

    with _patched_dropout(), torch.inference_mode():
        _, mel_post_r, _, _, _ = ref.inference(
            torch.from_numpy(tokens).long(),
            obs_labels=torch.from_numpy(obs), ret_has_eos=True)

    _, mel_post, _, _, n_steps, _ = tacotron2_infer(
        params, cfg, jnp.asarray(tokens),
        jnp.asarray([tokens.shape[1]], np.int32),
        obs_labels=jnp.asarray(obs, jnp.int32), prenet_dropout=False)
    n = int(n_steps[0])
    np.testing.assert_allclose(
        np.asarray(mel_post)[0, :n], mel_post_r.numpy()[0].T,
        atol=5e-4, rtol=1e-3)


def test_padded_bucket_invariance():
    """Serving pads tokens to buckets; valid outputs must not change."""
    cfg = tacotron2_test_config(gate_threshold=1.1, max_decoder_steps=10)
    _, params = _make_pair(cfg, seed=2)
    ids = np.array([1, 3, 5, 7, 2], np.int32)
    lengths = jnp.asarray([len(ids)], np.int32)

    outs = []
    for bucket in (len(ids), len(ids) + 11):
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, : len(ids)] = ids
        mels, mel_post, gates, aligns, n_steps, _ = tacotron2_infer(
            params, cfg, jnp.asarray(tokens), lengths, prenet_dropout=False)
        outs.append((np.asarray(mel_post), np.asarray(n_steps),
                     np.asarray(aligns)[:, :, : len(ids)]))

    assert outs[0][1] == outs[1][1]
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(outs[0][2], outs[1][2], atol=1e-5, rtol=1e-5)


def test_encoder_batch_padding_parity():
    """Batched padded encoding must equal each sequence's solo full-length
    run (reference encoder.py equivalently packs; model.py:206-234)."""
    cfg = tacotron2_test_config()
    _, params = _make_pair(cfg, seed=3)
    a = np.array([1, 2, 3, 4, 5, 6, 7], np.int32)
    b = np.array([8, 9, 10], np.int32)
    tokens = np.zeros((2, 7), np.int32)
    tokens[0] = a
    tokens[1, :3] = b
    lengths = jnp.asarray([7, 3], np.int32)
    batched = np.asarray(encoder_infer(params, cfg, jnp.asarray(tokens),
                                       lengths))
    solo_b = np.asarray(encoder_infer(params, cfg, jnp.asarray(b[None]),
                                      jnp.asarray([3], np.int32)))
    np.testing.assert_allclose(batched[1, :3], solo_b[0], atol=1e-5,
                               rtol=1e-5)
    assert np.all(batched[1, 3:] == 0)


def test_code_to_sequence_parity(tmp_path):
    """Unit-string front end matches the reference (text.py:74-107,
    utils.py load_code_dict)."""
    p = tmp_path / "code_dict.txt"
    p.write_text("10\n20\n30\n40\n")
    cd = load_code_dict(str(p), add_sos=True, add_eos=True)

    ref_cd = {c: i for i, c in
              enumerate(["_", "10", "20", "30", "40"])}
    ref_cd[REF.text.SOS_TOK] = len(ref_cd)
    ref_cd[REF.text.EOS_TOK] = len(ref_cd)
    assert cd == ref_cd

    codes = "10 10 20 99 30 30 30 40".split()
    for collapse in (False, True):
        ours = code_to_sequence(codes, cd, collapse)
        want = REF.text.code_to_sequence(codes, ref_cd, collapse)
        assert ours == list(want)

    ti = TacotronInput(cd, add_sos=True, add_eos=True, collapse_code=True)
    ids = ti.get_ids("10 10 20")
    assert ids.tolist() == [cd["<s>"], cd["10"], cd["20"], cd["</s>"]]


def test_tacotron_vocoder_end_to_end():
    """Units string -> waveform through the full TacotronVocoder glue
    (vocoder.py:45-60): bucketing, gate-stopped decode, WaveGlow at
    sigma=0.666, denoiser, host-side length slice."""
    from unitspeech_tpu.infer.unit_vocoder import TacotronVocoder
    from unitspeech_tpu.models.waveglow import (
        convert_waveglow, waveglow_test_config)

    taco_cfg = tacotron2_test_config(gate_threshold=1.1, max_decoder_steps=16)
    _, taco_params = _make_pair(taco_cfg, seed=5)

    wg_cfg = waveglow_test_config(n_mel_channels=taco_cfg.n_mel_channels,
                                  n_flows=3, n_channels=8)
    torch.manual_seed(6)
    wn_config = dict(n_layers=wg_cfg.n_layers, n_channels=wg_cfg.n_channels,
                     kernel_size=wg_cfg.kernel_size)
    ref_wg = REF.glow.WaveGlow(wg_cfg.n_mel_channels, wg_cfg.n_flows,
                               wg_cfg.n_group, wg_cfg.n_early_every,
                               wg_cfg.n_early_size, wn_config)
    ref_wg.upsample = torch.nn.ConvTranspose1d(
        wg_cfg.n_mel_channels, wg_cfg.n_mel_channels, wg_cfg.upsample_kernel,
        stride=wg_cfg.upsample_stride)
    wg_params = convert_waveglow(
        {k: v.numpy() for k, v in ref_wg.state_dict().items()}, wg_cfg)

    code_dict = {"_": 0, **{str(c): c + 1 for c in range(8)}}
    voc = TacotronVocoder(
        taco_params, taco_cfg, wg_params, wg_cfg,
        TacotronInput(code_dict), max_decoder_steps=16, denoiser_n_fft=32)
    wav = voc("1 3 5 2 4")
    assert wav.dtype == np.float32
    assert wav.ndim == 1
    # gate never fires -> 16 steps * stride samples
    assert wav.shape[0] == 16 * wg_cfg.upsample_stride
    assert np.all(np.isfinite(wav))

    # array input path
    wav2 = voc(np.array([1, 3, 5, 2, 4]))
    assert wav2.shape == wav.shape


def test_random_params_match_converted_tree_structure():
    """random_tacotron2_params / random_waveglow_params must produce the
    exact tree structure+shapes the torch converters produce (so demos and
    benches can initialize without torch) — checked leaf-by-leaf against a
    converted reference state dict."""
    import jax

    from unitspeech_tpu.models.tacotron2 import random_tacotron2_params
    from unitspeech_tpu.models.waveglow import (
        convert_waveglow,
        random_waveglow_params,
        waveglow_test_config,
    )

    cfg = tacotron2_test_config()
    _, conv_params = _make_pair(cfg, seed=1)
    rand_params = random_tacotron2_params(cfg, seed=0)
    ca, cb = jax.tree_util.tree_structure(conv_params), \
        jax.tree_util.tree_structure(rand_params)
    assert ca == cb
    for a, b in zip(jax.tree_util.tree_leaves(conv_params),
                    jax.tree_util.tree_leaves(rand_params)):
        assert np.asarray(a).shape == np.asarray(b).shape

    wg_cfg = waveglow_test_config(n_mel_channels=cfg.n_mel_channels,
                                  n_flows=3, n_channels=8)
    torch.manual_seed(2)
    wn_config = dict(n_layers=wg_cfg.n_layers, n_channels=wg_cfg.n_channels,
                     kernel_size=wg_cfg.kernel_size)
    ref_wg = REF.glow.WaveGlow(wg_cfg.n_mel_channels, wg_cfg.n_flows,
                               wg_cfg.n_group, wg_cfg.n_early_every,
                               wg_cfg.n_early_size, wn_config)
    ref_wg.upsample = torch.nn.ConvTranspose1d(
        wg_cfg.n_mel_channels, wg_cfg.n_mel_channels, wg_cfg.upsample_kernel,
        stride=wg_cfg.upsample_stride)
    conv_wg = convert_waveglow(
        {k: v.numpy() for k, v in ref_wg.state_dict().items()}, wg_cfg)
    rand_wg = random_waveglow_params(wg_cfg, seed=0)
    assert jax.tree_util.tree_structure(conv_wg) == \
        jax.tree_util.tree_structure(rand_wg)
    for a, b in zip(jax.tree_util.tree_leaves(conv_wg),
                    jax.tree_util.tree_leaves(rand_wg)):
        assert np.asarray(a).shape == np.asarray(b).shape


def test_resynthesis_example_tiny_stack():
    """examples/resynthesis.py end-to-end on the random tiny stack: wav ->
    units -> TacotronVocoder -> waveform + bitrate stat (textlesslib
    examples/resynthesis parity, SURVEY #30 tail)."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "resynthesis_example", os.path.join(root, "examples/resynthesis.py"))
    ex = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ex)

    encoder, voc, name, vocab = ex.build_tiny_stack()
    t = np.arange(8000) / 16000.0
    wav = (0.3 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
    units = np.asarray(encoder(wav)["units"])
    assert units.size > 0
    uniform, unigram = ex.bitrates("hubert-base-ls960", units.size, 100, 0.5)
    assert abs(uniform - np.log2(100) * units.size / 0.5) < 1e-9
    assert abs(unigram - 6.4451 * units.size / 0.5) < 1e-9
    out = voc(units)
    assert out.ndim == 1 and out.size > 0 and np.isfinite(out).all()


def test_speaker_probing_example():
    """examples/speaker_probing.py: both probes must beat the constant
    baseline on the synthetic two-speaker corpus (textlesslib
    examples/speaker_probing parity, SURVEY #30 tail)."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import sys

    spec = importlib.util.spec_from_file_location(
        "speaker_probing_example",
        os.path.join(root, "examples/speaker_probing.py"))
    ex = importlib.util.module_from_spec(spec)
    # dataclass-transformed flax modules resolve their defining module at
    # class creation; it must be importable by name during exec
    sys.modules[spec.name] = ex
    spec.loader.exec_module(ex)
    baseline, disc, cont = ex.main(["--steps", "40", "--n-per-speaker", "8"])
    assert baseline <= 0.5 + 1e-9
    assert disc > baseline
    assert cont > baseline


def test_gslm_example_ulm_and_sampling():
    """examples/gslm.py: the unit LM must beat uniform cross-entropy on the
    synthetic corpus and the scan sampler must emit the requested number of
    in-vocab units (textlesslib examples/gslm parity, SURVEY #30 tail)."""
    import importlib.util
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gslm_example", os.path.join(root, "examples/gslm.py"))
    ex = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = ex
    spec.loader.exec_module(ex)

    rng = np.random.default_rng(0)
    vocab = 6
    # strongly structured streams: the LM must learn the 0-1 alternation
    streams = [np.tile([0, 1], 200), np.tile([2, 3], 200)]
    lm, params, loss = ex.train_ulm(streams, vocab, steps=60, seq_len=32,
                                    batch=8, d_model=32)
    assert loss < np.log(vocab) * 0.5, loss
    cont = ex.sample_continuation(lm, params, [0, 1, 0, 1], 25,
                                  temperature=0.5)
    assert cont.shape == (25,)
    assert cont.min() >= 0 and cont.max() < vocab
    # a near-deterministic corpus should be continued mostly in-pattern
    expected = np.tile([0, 1], 13)[:25]
    assert (cont == expected).mean() > 0.6
