"""Unit tests for mask/path ops against the reference's formulas
(/root/reference/unitspeech/util.py:20-66)."""

import jax.numpy as jnp
import numpy as np
import pytest

from unitspeech_tpu.ops.masking import (
    choose_bucket,
    default_frame_buckets,
    fix_len_compatibility,
    generate_path,
    intersperse,
    sequence_mask,
)


def test_sequence_mask_basic():
    lengths = jnp.array([1, 3, 5])
    m = sequence_mask(lengths, 5)
    expected = np.array(
        [[1, 0, 0, 0, 0], [1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], dtype=np.float32
    )
    np.testing.assert_array_equal(np.asarray(m), expected)


def test_sequence_mask_dtype():
    m = sequence_mask(jnp.array([2]), 4, dtype=jnp.bool_)
    assert m.dtype == jnp.bool_


def _brute_force_path(duration, t_y):
    """O(Tx*Ty) oracle: row x covers frames [cum_{x-1}, cum_x)."""
    b, t_x = duration.shape
    path = np.zeros((b, t_x, t_y), dtype=np.float32)
    for i in range(b):
        cum = 0
        for x in range(t_x):
            d = int(duration[i, x])
            path[i, x, cum : min(cum + d, t_y)] = 1.0
            cum += d
    return path


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_generate_path_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    b, t_x = 3, 7
    duration = rng.integers(0, 5, size=(b, t_x)).astype(np.float32)
    t_y = int(duration.sum(axis=1).max()) + 2
    mask = np.ones((b, t_x, t_y), dtype=np.float32)
    got = np.asarray(generate_path(jnp.asarray(duration), jnp.asarray(mask)))
    np.testing.assert_array_equal(got, _brute_force_path(duration, t_y))


def test_generate_path_row_sums_equal_durations():
    duration = jnp.array([[2.0, 0.0, 3.0]])
    mask = jnp.ones((1, 3, 5))
    path = generate_path(duration, mask)
    np.testing.assert_allclose(np.asarray(path.sum(-1)), [[2.0, 0.0, 3.0]])
    # each frame is assigned to exactly one token
    np.testing.assert_allclose(np.asarray(path.sum(1)), [[1.0] * 5])


def test_fix_len_compatibility():
    assert fix_len_compatibility(172) == 176
    assert fix_len_compatibility(176) == 176
    assert fix_len_compatibility(1) == 8
    assert fix_len_compatibility(17, 2) == 20
    # reference's 2s @ 22050/256 segment: ceil(172.26) -> 172 -> 176
    assert fix_len_compatibility(2 * 22050 // 256) == 176


def test_intersperse():
    assert intersperse([1, 2, 3], 0) == [0, 1, 0, 2, 0, 3, 0]
    assert intersperse([], 9) == [9]


def test_buckets():
    buckets = default_frame_buckets(1024)
    assert all(b % 8 == 0 for b in buckets)
    assert choose_bucket(100, buckets) >= 100
    assert choose_bucket(100, buckets) in buckets
    # monotone
    assert list(buckets) == sorted(buckets)


# --- conv3x3 matmul reformulations (ops/conv_matmul.py) ---------------------


@pytest.mark.parametrize(
    "cin,cout,impl",
    [(512, 512, "taps"), (512, 1024, "im2col"),
     (1024, 1024, "im2col"), (1024, 512, "im2col"), (8, 16, "taps")],
)
def test_conv3x3_matmul_exact_vs_nn_conv(cin, cout, impl):
    """taps/im2col are EXACT reformulations of a SAME-padded 3x3 conv on the
    (T, F) grid — checkpoint-compatible with nn.Conv at the deep U-Net
    stages (the shapes where Block swaps implementations)."""
    import flax.linen as nn
    import jax

    from unitspeech_tpu.ops.conv_matmul import conv3x3_matmul

    b, t, f = 2, 6, 5
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, t, f, cin))
    conv = nn.Conv(cout, (3, 3), padding=[(1, 1), (1, 1)])
    p = conv.init(jax.random.PRNGKey(1), x)
    ref = np.asarray(conv.apply(p, x))
    got = np.asarray(
        conv3x3_matmul(x, p["params"]["kernel"], p["params"]["bias"], impl)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_choose_conv_impl_stages():
    from unitspeech_tpu.ops.conv_matmul import choose_conv_impl

    assert choose_conv_impl(2, 128) == "xla"       # stage0 entry
    assert choose_conv_impl(256, 256) == "xla"     # stage1
    assert choose_conv_impl(512, 512) == "taps"    # stage2
    assert choose_conv_impl(512, 1024) == "im2col"  # stage3 entry
    assert choose_conv_impl(1024, 1024) == "im2col"  # mid
    assert choose_conv_impl(1024, 512) == "im2col"  # up skip-concat


def test_conv3x3_int8_error_bound():
    """Opt-in int8 conv: dynamic per-tensor activation + per-channel weight
    scales keep the relative error at the ~1% level at realistic magnitudes
    (max-normalized; per-tensor activation quantization's floor)."""
    import jax

    from unitspeech_tpu.ops.conv_matmul import conv3x3_int8, conv3x3_taps

    b, t, f, cin, cout = 2, 6, 5, 32, 48
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, t, f, cin)) * 0.5
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout)) * 0.1
    xf = x.reshape(b, t * f, cin)
    ref = np.asarray(conv3x3_taps(xf, w, f))
    got = np.asarray(conv3x3_int8(xf, w, f))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02, rel


def test_conv_transpose4x4_matmul_vs_flax():
    """Phase-decomposed ConvTranspose == flax/lax conv_transpose to f32
    roundoff (the model's Upsample runs this form; unet.py:Upsample)."""
    import flax.linen as nn
    import jax

    from unitspeech_tpu.ops.conv_matmul import conv_transpose4x4_matmul

    b, t, f, c, co = 2, 8, 6, 5, 7
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, f, c))
    up = nn.ConvTranspose(co, (4, 4), strides=(2, 2), padding=[(2, 2), (2, 2)])
    p = up.init(jax.random.PRNGKey(1), x)
    ref = np.asarray(up.apply(p, x))
    got = np.asarray(
        conv_transpose4x4_matmul(x, p["params"]["kernel"], p["params"]["bias"])
    )
    assert got.shape == (b, 2 * t, 2 * f, co)
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_conv3x3_stride2_matmul_vs_flax():
    """Subsampled-matmul strided conv == flax nn.Conv stride 2 (the model's
    Downsample; also exercises odd T/F ceil semantics)."""
    import flax.linen as nn
    import jax

    from unitspeech_tpu.ops.conv_matmul import conv3x3_stride2_matmul

    for t, f in ((8, 6), (7, 5)):
        b, c, co = 2, 5, 7
        x = jax.random.normal(jax.random.PRNGKey(0), (b, t, f, c))
        dn = nn.Conv(co, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        p = dn.init(jax.random.PRNGKey(1), x)
        ref = np.asarray(dn.apply(p, x))
        got = np.asarray(
            conv3x3_stride2_matmul(x, p["params"]["kernel"], p["params"]["bias"])
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-6)
