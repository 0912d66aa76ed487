"""Fused rezero linear attention Pallas kernel vs the XLA path (interpret
mode on CPU): identical params, matching outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitspeech_tpu.models.unet import RezeroAttention
from unitspeech_tpu.ops.pallas_attention import fused_rezero_attention


@pytest.mark.parametrize("n,c,t_tile", [(64, 16, 16), (96, 32, 32), (90, 16, 32)])
def test_fused_attention_matches_reference_math(n, c, t_tile):
    rng = np.random.default_rng(0)
    h, d = 2, 8
    x = jnp.asarray(rng.standard_normal((2, n, c)) * 0.5, jnp.float32)
    w_qkv = jnp.asarray(rng.standard_normal((c, 3 * h * d)) * 0.2, jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((h * d, c)) * 0.2, jnp.float32)
    b_out = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    g = jnp.asarray([0.7], jnp.float32)

    got = np.asarray(fused_rezero_attention(
        x, w_qkv, w_out, b_out, g, heads=h, dim_head=d, t_tile=t_tile,
        interpret=True,
    ))

    # reference math (unitspeech.py:78-106)
    qkv = np.asarray(x) @ np.asarray(w_qkv)
    q, k, v = np.split(qkv, 3, axis=-1)
    q = q.reshape(2, n, h, d)
    k = k.reshape(2, n, h, d)
    v = v.reshape(2, n, h, d)
    k = np.exp(k - k.max(axis=1, keepdims=True))
    k = k / k.sum(axis=1, keepdims=True)
    context = np.einsum("bnhd,bnhe->bhde", k, v)
    out = np.einsum("bnhd,bhde->bnhe", q, context).reshape(2, n, h * d)
    want = np.asarray(x) + 0.7 * (out @ np.asarray(w_out) + np.asarray(b_out))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_rezero_attention_pallas_path_matches_xla_path():
    h, d, c = 2, 8, 16
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 8, 8, c)) * 0.5, jnp.float32
    )
    xla = RezeroAttention(heads=h, dim_head=d)
    pal = RezeroAttention(heads=h, dim_head=d, use_pallas=True)
    params = xla.init(jax.random.PRNGKey(0), x)
    params_p = pal.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_p)
    # nonzero g so the attention branch contributes
    params = jax.tree_util.tree_map(lambda a: a, params)
    params["params"]["g"] = jnp.asarray([0.5])
    a = np.asarray(xla.apply(params, x))
    b = np.asarray(pal.apply(params, x))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)
