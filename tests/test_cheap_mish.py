"""Cheap-mish glue approximations (ops/cheap_mish.py).

Locks (a) each variant's documented absolute-error bound vs exact mish
(the reference activation, /root/reference/unitspeech/unitspeech.py:13-15),
and (b) that the flat deep-stage ResnetBlock under an approximate glue mish
stays within the expected envelope of the exact-glue output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitspeech_tpu.ops.cheap_mish import GLUE_MISH_IMPLS, glue_mish

BOUNDS = {
    "exact": 3e-6,
    "rational66": 7e-4,
    "rational44": 1.4e-2,
    "poly5": 6.5e-2,
    "hard": 2.6e-1,
}


def _mish_f64(x):
    return x * np.tanh(np.log1p(np.exp(np.minimum(x, 50.0))))


@pytest.mark.parametrize("impl", GLUE_MISH_IMPLS)
def test_mish_variant_error_bound(impl):
    x = np.linspace(-30.0, 30.0, 240001).astype(np.float32)
    y = np.asarray(glue_mish(jnp.asarray(x), impl), np.float64)
    err = np.max(np.abs(y - _mish_f64(x.astype(np.float64))))
    assert err <= BOUNDS[impl], (impl, err)


@pytest.mark.parametrize("impl", GLUE_MISH_IMPLS)
def test_mish_variant_asymptotes(impl):
    # far tails must be exact-asymptote clamped: identity above, ~zero below
    x = jnp.asarray([64.0, 1000.0], jnp.float32)
    np.testing.assert_allclose(np.asarray(glue_mish(x, impl)), np.asarray(x))
    lo = np.asarray(glue_mish(jnp.asarray([-64.0, -1000.0], jnp.float32), impl))
    assert np.max(np.abs(lo)) <= 1e-4


@pytest.mark.parametrize("impl", ["rational66", "rational44", "poly5"])
@pytest.mark.parametrize("cin,cout", [(512, 512), (1024, 1024), (256, 512)])
def test_flat_block_glue_mish_envelope(impl, cin, cout):
    """Flat matmul ResnetBlock (the only consumer of glue_mish): output under
    an approximate glue stays within ~4x the variant's per-activation bound
    (two glue applications + conv mixing; weights are lecun-normal so the
    conv is ~an isometry)."""
    from unitspeech_tpu.models.unet import ResnetBlock

    key = jax.random.PRNGKey(0)
    b, t, f = 2, 8, 8
    x = jax.random.normal(key, (b, t, f, cin), jnp.float32)
    mask = jnp.ones((b, t, 1, 1))
    t_emb = jax.random.normal(jax.random.PRNGKey(1), (b, 96), jnp.float32)

    ref_block = ResnetBlock(cout, groups=8, glue_mish="exact")
    params = ref_block.init(jax.random.PRNGKey(2), x, mask, t_emb)
    ref = np.asarray(ref_block.apply(params, x, mask, t_emb))
    got = np.asarray(
        ResnetBlock(cout, groups=8, glue_mish=impl).apply(params, x, mask, t_emb)
    )
    assert np.max(np.abs(got - ref)) <= 4.0 * BOUNDS[impl] + 1e-5


def test_flat_block_default_is_exact():
    """glue_mish defaults to exact -> bit-identical to the pre-knob output."""
    from unitspeech_tpu.models.unet import ResnetBlock

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 4, 8, 512), jnp.float32)
    mask = jnp.ones((1, 4, 1, 1))
    t_emb = jax.random.normal(jax.random.PRNGKey(1), (1, 96), jnp.float32)
    block = ResnetBlock(512, groups=8)
    params = block.init(jax.random.PRNGKey(2), x, mask, t_emb)
    a = np.asarray(block.apply(params, x, mask, t_emb))
    b = np.asarray(
        ResnetBlock(512, groups=8, glue_mish="exact").apply(params, x, mask, t_emb)
    )
    np.testing.assert_array_equal(a, b)
