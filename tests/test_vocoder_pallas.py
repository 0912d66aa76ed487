"""Pallas-path BigVGAN vs XLA-path BigVGAN (same params)."""

import jax
import jax.numpy as jnp
import numpy as np

from unitspeech_tpu.models.vocoder import BigVGAN


def test_bigvgan_pallas_path_matches_xla_path():
    kw = dict(
        num_mels=8,
        upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=16,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    voc = BigVGAN(**kw)
    voc_p = BigVGAN(**kw, use_pallas=True)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((1, 40, 8)), jnp.float32)
    params = voc.init(jax.random.PRNGKey(0), mel)
    # identical param trees (the pallas flag must not change parameters)
    params_p = voc_p.init(jax.random.PRNGKey(0), mel)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_p)

    a = np.asarray(voc.apply(params, mel))
    b = np.asarray(voc_p.apply(params, mel))
    assert a.shape == b.shape
    # interiors match tightly; boundary samples use extended-LTI padding
    n = a.shape[1]
    sl = slice(n // 8, -n // 8)
    np.testing.assert_allclose(a[:, sl], b[:, sl], rtol=2e-2, atol=2e-3)


def test_bigvgan_pallas_large_kernels_and_block2():
    """Fused AA+conv covers the real config's k=7/11 resblocks (the conv
    reach rides an extended in-kernel window) and the AMPBlock2 variant."""
    for resblock, ks, ds in (
        ("1", (3, 7), ((1, 3, 5), (1, 3, 5))),
        ("2", (11,), ((1, 3),)),
    ):
        kw = dict(
            num_mels=8,
            upsample_rates=(2, 2),
            upsample_kernel_sizes=(4, 4),
            upsample_initial_channel=16,
            resblock=resblock,
            resblock_kernel_sizes=ks,
            resblock_dilation_sizes=ds,
        )
        voc = BigVGAN(**kw)
        voc_p = BigVGAN(**kw, use_pallas=True)
        # edge-approximation zones (extended-LTI vs replicate-pad) grow with
        # conv reach and double through each upsample stage — use a long
        # signal and compare a deep interior
        mel = jnp.asarray(
            np.random.default_rng(1).standard_normal((1, 256, 8)), jnp.float32
        )
        params = voc.init(jax.random.PRNGKey(0), mel)
        params_p = voc_p.init(jax.random.PRNGKey(0), mel)
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_p)
        a = np.asarray(voc.apply(params, mel))
        b = np.asarray(voc_p.apply(params, mel))
        sl = slice(320, -320)
        np.testing.assert_allclose(a[:, sl], b[:, sl], rtol=2e-2, atol=2e-3)
