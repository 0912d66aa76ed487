"""Fused Pallas ResnetBlock vs the XLA ResnetBlock (models/unet.py) —
interpret mode on CPU; the XLA path itself is output-level verified against
the reference torch modules (tests/test_reference_parity.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitspeech_tpu.models.unet import ResnetBlock, mish
from unitspeech_tpu.ops.pallas_resnet import fused_resnet_block


def _run_pair(b, t, f, cin, cout, groups, lens, seed=0, frames_per_tile=0,
              tap_mode=None):
    key = jax.random.PRNGKey(seed)
    block = ResnetBlock(cout, groups)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, t, f, cin))
    t_emb = jax.random.normal(jax.random.fold_in(key, 2), (b, 12))
    mask = (jnp.arange(t)[None, :] < jnp.asarray(lens)[:, None]).astype(
        jnp.float32
    )[:, :, None, None]
    params = block.init(key, x, mask, t_emb)

    ref = block.apply(params, x, mask, t_emb)

    p = params["params"]
    t_bias = mish(t_emb) @ p["mlp"]["kernel"] + p["mlp"]["bias"]
    fused = fused_resnet_block(
        x, mask, t_bias,
        p["block1"]["conv"]["kernel"], p["block1"]["conv"]["bias"],
        p["block1"]["norm"]["scale"], p["block1"]["norm"]["bias"],
        p["block2"]["conv"]["kernel"], p["block2"]["conv"]["bias"],
        p["block2"]["norm"]["scale"], p["block2"]["norm"]["bias"],
        wres=p["res_conv"]["kernel"] if cin != cout else None,
        bres=p["res_conv"]["bias"] if cin != cout else None,
        groups=groups,
        interpret=True,
        frames_per_tile=frames_per_tile,
        tap_mode=tap_mode,
    )
    return np.asarray(ref), np.asarray(fused)


@pytest.mark.parametrize(
    "cin,cout,lens",
    [
        (4, 8, [16, 16]),   # res_conv path, full mask
        (4, 8, [16, 11]),   # res_conv path, padded batch
        (8, 8, [16, 5]),    # identity residual, heavy padding
    ],
)
def test_fused_resnet_parity(cin, cout, lens):
    ref, fused = _run_pair(2, 16, 8, cin, cout, groups=4, lens=lens)
    np.testing.assert_allclose(fused, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("tap_mode", ["taps3", "im2col"])
@pytest.mark.parametrize(
    "cin,cout,lens",
    [
        (4, 8, [16, 11]),   # res_conv path, padded batch
        (8, 8, [16, 5]),    # identity residual, heavy padding
    ],
)
def test_fused_resnet_tap_modes(cin, cout, lens, tap_mode):
    """The alternate conv structures inside the fused kernels ("taps3":
    3 lane-concat K=3C dots; "im2col": one K=9C dot) are numerically
    equivalent routes to the default 9-tap form."""
    ref, fused = _run_pair(2, 16, 8, cin, cout, groups=4, lens=lens,
                           tap_mode=tap_mode)
    np.testing.assert_allclose(fused, ref, atol=2e-5, rtol=1e-4)


def test_fused_resnet_first_stage_shape():
    """Estimator entry shape: Cin=2 (stacked mu, x_t), like down_0 res1."""
    ref, fused = _run_pair(1, 8, 8, 2, 16, groups=8, lens=[6])
    np.testing.assert_allclose(fused, ref, atol=2e-5, rtol=1e-4)


def test_fused_resnet_masked_region_is_zero():
    _, fused = _run_pair(1, 16, 8, 4, 8, groups=4, lens=[9])
    assert np.all(fused[0, 9:] == 0.0)


@pytest.mark.parametrize("fpt", [2, 4, 8])
def test_fused_resnet_multi_tile(fpt):
    """Multi-tile grids: halo assembly from neighbor blocks, clamped edge
    blocks, and cross-tile GroupNorm stats accumulation."""
    ref, fused = _run_pair(2, 16, 8, 4, 8, groups=4, lens=[16, 10],
                           frames_per_tile=fpt)
    np.testing.assert_allclose(fused, ref, atol=2e-5, rtol=1e-4)


def test_fused_resnet_odd_frame_count():
    """T=43-style prime frame counts (deepest U-Net stage) fall back to a
    single whole-T tile."""
    ref, fused = _run_pair(1, 12, 4, 4, 8, groups=4, lens=[7],
                           frames_per_tile=3)
    np.testing.assert_allclose(fused, ref, atol=2e-5, rtol=1e-4)


def test_estimator_pallas_resnet_parity():
    """Full U-Net with use_pallas_resnet=True shares the XLA checkpoint tree
    and matches its output (interpret mode on CPU)."""
    from unitspeech_tpu.models.unet import GradLogPEstimator2d

    kw = dict(dim=8, dim_mults=(1, 2), groups=8, spk_emb_dim=8)
    xla = GradLogPEstimator2d(**kw)
    fused = GradLogPEstimator2d(**kw, use_pallas_resnet=True)

    b, t, f = 2, 8, 16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, t, f))
    mu = jax.random.normal(jax.random.fold_in(key, 2), (b, t, f))
    mask = (jnp.arange(t)[None, :] < jnp.array([8, 5])[:, None]).astype(jnp.float32)
    tt = jnp.array([0.3, 0.8])
    spk = jax.random.normal(jax.random.fold_in(key, 3), (b, 8))

    params = xla.init(key, x, mask, mu, tt, spk)
    params_f = fused.init(key, x, mask, mu, tt, spk)
    # identical parameter trees -> checkpoints are interchangeable
    assert jax.tree.structure(params) == jax.tree.structure(params_f)

    ref = xla.apply(params, x, mask, mu, tt, spk)
    got = fused.apply(params, x, mask, mu, tt, spk)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-4
    )


def test_flat_matmul_resnet_parity(monkeypatch):
    """Deep-stage ResnetBlocks (C >= 512) run whole-block in the flat
    (B, T*F, C) layout with matmul convs; same params must reproduce the
    nn.Conv branch (which we force via the impl chooser) to f32 tolerance."""
    import unitspeech_tpu.ops.conv_matmul as cm
    from unitspeech_tpu.models.unet import ResnetBlock

    b, t, f, cin, cout = 2, 8, 4, 512, 512
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, t, f, cin)) * 0.4
    t_emb = jax.random.normal(jax.random.fold_in(key, 2), (b, 24))
    mask = (jnp.arange(t)[None, :] < jnp.asarray([8, 5])[:, None]).astype(
        jnp.float32
    )[:, :, None, None]

    block = ResnetBlock(cout, groups=8)
    params = block.init(key, x, mask, t_emb)  # flat branch builds the tree
    got = np.asarray(block.apply(params, x, mask, t_emb))

    monkeypatch.setattr(cm, "choose_conv_impl", lambda ci, co: "xla")
    ref = np.asarray(block.apply(params, x, mask, t_emb))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)
    assert np.all(got[1, 5:] == 0.0)  # padding stays zero


def test_flat_matmul_resnet_res_conv_parity(monkeypatch):
    """Same, with the 1x1 residual projection path (cin != cout)."""
    import unitspeech_tpu.ops.conv_matmul as cm
    from unitspeech_tpu.models.unet import ResnetBlock

    b, t, f, cin, cout = 1, 4, 4, 256, 512
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, t, f, cin)) * 0.4
    t_emb = jax.random.normal(jax.random.fold_in(key, 2), (b, 24))
    mask = jnp.ones((b, t, 1, 1))

    block = ResnetBlock(cout, groups=8)
    params = block.init(key, x, mask, t_emb)
    got = np.asarray(block.apply(params, x, mask, t_emb))

    monkeypatch.setattr(cm, "choose_conv_impl", lambda ci, co: "xla")
    ref = np.asarray(block.apply(params, x, mask, t_emb))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("lens", [[16, 16], [16, 9]])
def test_fused_final_block_parity(lens):
    """Fused final conv+GN+mish+final_conv pair vs the XLA Block + 1x1 conv
    (models/unet.py GradLogPEstimator2d tail, reference unitspeech.py:198-201)."""
    import flax.linen as nn

    from unitspeech_tpu.models.unet import Block
    from unitspeech_tpu.ops.pallas_resnet import fused_final_block

    b, t, f, c = 2, 16, 8, 8
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, t, f, c))
    mask = (jnp.arange(t)[None, :] < jnp.asarray(lens)[:, None]).astype(
        jnp.float32
    )[:, :, None, None]

    block = Block(c, groups=4)
    bp = block.init(key, x, mask)
    conv1 = nn.Conv(1, (1, 1))
    cp = conv1.init(jax.random.fold_in(key, 2), x[..., :c])

    h = block.apply(bp, x, mask)
    ref = (conv1.apply(cp, h * mask) * mask)[..., 0]

    p, q = bp["params"], cp["params"]
    fused = fused_final_block(
        x, mask,
        p["conv"]["kernel"], p["conv"]["bias"],
        p["norm"]["scale"], p["norm"]["bias"],
        q["kernel"], q["bias"],
        groups=4, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


@pytest.mark.parametrize(
    "cin,cout,lens",
    # (16, 8): the cin > cout hybrid branch (conv1 as the XLA matmul +
    # fused kernels B/C) used by the up-stage skip-concat projections
    # 2048->512 / 1024->256 (ADVICE r3)
    [(8, 16, [15, 9]), (16, 16, [15, 15]), (16, 8, [15, 9])],
)
def test_fused_resnet_deep_parity(cin, cout, lens):
    """Whole-layer deep-stage fused kernels (no tiles/halos, odd T, F%8!=0)
    vs the XLA ResnetBlock."""
    from unitspeech_tpu.ops.pallas_resnet import fused_resnet_block_deep

    b, t, f = 2, 15, 6  # odd T, F not a multiple of 8 (deep-stage shapes)
    key = jax.random.PRNGKey(7)
    block = ResnetBlock(cout, groups=4)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, t, f, cin))
    t_emb = jax.random.normal(jax.random.fold_in(key, 2), (b, 12))
    mask = (jnp.arange(t)[None, :] < jnp.asarray(lens)[:, None]).astype(
        jnp.float32
    )[:, :, None, None]
    params = block.init(key, x, mask, t_emb)
    ref = block.apply(params, x, mask, t_emb)

    p = params["params"]
    t_bias = mish(t_emb) @ p["mlp"]["kernel"] + p["mlp"]["bias"]
    fused = fused_resnet_block_deep(
        x, mask, t_bias,
        p["block1"]["conv"]["kernel"], p["block1"]["conv"]["bias"],
        p["block1"]["norm"]["scale"], p["block1"]["norm"]["bias"],
        p["block2"]["conv"]["kernel"], p["block2"]["conv"]["bias"],
        p["block2"]["norm"]["scale"], p["block2"]["norm"]["bias"],
        wres=p["res_conv"]["kernel"] if cin != cout else None,
        bres=p["res_conv"]["bias"] if cin != cout else None,
        groups=4, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_fused_resnet_deep_cout_split():
    """The output-channel grid split is exercised with a tiny VMEM budget
    equivalent (cout wide enough to force cb < cout via monkeypatched
    budget)."""
    from unitspeech_tpu.ops import pallas_resnet as pr

    assert pr._cout_split(1024, 1024) < 1024  # real mid-stage case splits
    assert pr._cout_split(8, 256) == 256      # small weights stay whole


def test_fused_resnet_int8_error_bound():
    """Opt-in int8 inside the fused kernels: per-tile dynamic activation +
    per-channel weight scales keep the block output within a few percent of
    the float path (the flat-path int8 test bounds the same scheme per
    conv)."""
    ref, _ = _run_pair(2, 16, 8, 8, 8, groups=4, lens=[16, 16])
    key = jax.random.PRNGKey(0)
    block = ResnetBlock(8, 4)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 16, 8, 8))
    t_emb = jax.random.normal(jax.random.fold_in(key, 2), (2, 12))
    mask = jnp.ones((2, 16, 1, 1))
    params = block.init(key, x, mask, t_emb)
    p = params["params"]
    t_bias = mish(t_emb) @ p["mlp"]["kernel"] + p["mlp"]["bias"]
    got = fused_resnet_block(
        x, mask, t_bias,
        p["block1"]["conv"]["kernel"], p["block1"]["conv"]["bias"],
        p["block1"]["norm"]["scale"], p["block1"]["norm"]["bias"],
        p["block2"]["conv"]["kernel"], p["block2"]["conv"]["bias"],
        p["block2"]["norm"]["scale"], p["block2"]["norm"]["bias"],
        groups=4, interpret=True, int8=True,
    )
    rel = np.abs(np.asarray(got) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


@pytest.mark.parametrize("cin,cout", [(8, 16), (16, 16), (16, 8)])
def test_fused_resnet_deep_int8_error_bound(cin, cout):
    """int8 inside the whole-layer deep kernels (per-batch-element dynamic
    activation scale + per-channel weight scales) stays within a few percent
    of the float block — the same bound as the early-stage in-kernel int8."""
    from unitspeech_tpu.ops.pallas_resnet import fused_resnet_block_deep

    b, t, f = 2, 15, 6
    key = jax.random.PRNGKey(11)
    block = ResnetBlock(cout, groups=4)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, t, f, cin))
    t_emb = jax.random.normal(jax.random.fold_in(key, 2), (b, 12))
    mask = (jnp.arange(t)[None, :] < jnp.asarray([15, 9])[:, None]).astype(
        jnp.float32
    )[:, :, None, None]
    params = block.init(key, x, mask, t_emb)
    ref = np.asarray(block.apply(params, x, mask, t_emb))

    p = params["params"]
    t_bias = mish(t_emb) @ p["mlp"]["kernel"] + p["mlp"]["bias"]
    got = fused_resnet_block_deep(
        x, mask, t_bias,
        p["block1"]["conv"]["kernel"], p["block1"]["conv"]["bias"],
        p["block1"]["norm"]["scale"], p["block1"]["norm"]["bias"],
        p["block2"]["conv"]["kernel"], p["block2"]["conv"]["bias"],
        p["block2"]["norm"]["scale"], p["block2"]["norm"]["bias"],
        wres=p["res_conv"]["kernel"] if cin != cout else None,
        bres=p["res_conv"]["bias"] if cin != cout else None,
        groups=4, interpret=True, int8=True,
    )
    rel = np.abs(np.asarray(got) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel
    # padding rows stay exactly zero through the quantized path
    assert np.abs(np.asarray(got)[1, 9:]).max() == 0.0


@pytest.mark.parametrize("cin,cout", [(8, 16), (16, 16), (16, 8)])
def test_fused_resnet_deep_i8pre_error_bound(cin, cout):
    """Pre-quantized int8 deep kernels (fused_resnet_block_deep_i8): the
    activations quantize OUTSIDE the conv kernels (per-batch-element scale),
    so the whole-layer kernels assemble int8 windows directly — the VMEM
    shape the r3 in-kernel int8 variant blew up on. Same error band as the
    other int8 paths; padding rows stay exactly zero."""
    from unitspeech_tpu.ops.pallas_resnet import fused_resnet_block_deep_i8

    b, t, f = 2, 15, 6
    key = jax.random.PRNGKey(13)
    block = ResnetBlock(cout, groups=4)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, t, f, cin))
    t_emb = jax.random.normal(jax.random.fold_in(key, 2), (b, 12))
    mask = (jnp.arange(t)[None, :] < jnp.asarray([15, 9])[:, None]).astype(
        jnp.float32
    )[:, :, None, None]
    params = block.init(key, x, mask, t_emb)
    ref = np.asarray(block.apply(params, x, mask, t_emb))

    p = params["params"]
    t_bias = mish(t_emb) @ p["mlp"]["kernel"] + p["mlp"]["bias"]
    got = fused_resnet_block_deep_i8(
        x, mask, t_bias,
        p["block1"]["conv"]["kernel"], p["block1"]["conv"]["bias"],
        p["block1"]["norm"]["scale"], p["block1"]["norm"]["bias"],
        p["block2"]["conv"]["kernel"], p["block2"]["conv"]["bias"],
        p["block2"]["norm"]["scale"], p["block2"]["norm"]["bias"],
        wres=p["res_conv"]["kernel"] if cin != cout else None,
        bres=p["res_conv"]["bias"] if cin != cout else None,
        groups=4, interpret=True,
    )
    rel = np.abs(np.asarray(got) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel
    assert np.abs(np.asarray(got)[1, 9:]).max() == 0.0


def test_estimator_routes_deep_kernel_over_flat_int8():
    """use_pallas_deep + use_int8 routes cout >= cin deep blocks through the
    BF16 fused whole-layer kernel (the in-kernel int8 variant crashes the
    TPU compiler — tools/probe_deep_shapes.py --int8; bf16 deep measures
    faster than flat int8 anyway) and matches the flat int8 path within the
    int8 tolerance band."""
    b, t, f, cin, cout = 1, 9, 6, 512, 512
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, t, f, cin)) * 0.1
    t_emb = jax.random.normal(jax.random.fold_in(key, 2), (b, 12))
    mask = jnp.ones((b, t, 1, 1))

    flat = ResnetBlock(cout, groups=4, use_int8=True)
    deep = ResnetBlock(cout, groups=4, use_int8=True, use_pallas_deep=True)
    params = flat.init(key, x, mask, t_emb)
    a = np.asarray(flat.apply(params, x, mask, t_emb))
    bout = np.asarray(deep.apply(params, x, mask, t_emb))
    rel = np.abs(a - bout).max() / (np.abs(a).max() + 1e-9)
    assert rel < 0.05, rel
