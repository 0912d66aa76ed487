"""Op-level parity for every torch->flax layout rule in
utils/torch_convert.py, against torch CPU ops directly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

from unitspeech_tpu.utils.torch_convert import (
    conv1d_kernel,
    conv2d_kernel,
    convtranspose1d_kernel,
    convtranspose2d_kernel,
    dense_from_conv1x1,
    fold_weight_norm,
    linear_kernel,
)

torch = pytest.importorskip("torch")


@pytest.fixture(autouse=True)
def _seed():
    torch.manual_seed(0)


def test_linear_rule():
    x = np.random.default_rng(0).standard_normal((3, 5)).astype(np.float32)
    tl = torch.nn.Linear(5, 7)
    want = tl(torch.from_numpy(x)).detach().numpy()
    got = x @ linear_kernel(tl.weight.detach().numpy()) + tl.bias.detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv1d_rule():
    x = np.random.default_rng(0).standard_normal((2, 4, 10)).astype(np.float32)  # NCT
    tc = torch.nn.Conv1d(4, 6, 3, padding=1)
    want = tc(torch.from_numpy(x)).detach().numpy()
    m = nn.Conv(6, (3,), padding=[(1, 1)])
    params = {"params": {
        "kernel": jnp.asarray(conv1d_kernel(tc.weight.detach().numpy())),
        "bias": jnp.asarray(tc.bias.detach().numpy()),
    }}
    got = np.asarray(m.apply(params, jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=1e-5)


def test_conv1d_dilated_rule():
    x = np.random.default_rng(1).standard_normal((1, 4, 20)).astype(np.float32)
    tc = torch.nn.Conv1d(4, 4, 3, padding=3, dilation=3)
    want = tc(torch.from_numpy(x)).detach().numpy()
    m = nn.Conv(4, (3,), padding=[(3, 3)], kernel_dilation=(3,))
    params = {"params": {
        "kernel": jnp.asarray(conv1d_kernel(tc.weight.detach().numpy())),
        "bias": jnp.asarray(tc.bias.detach().numpy()),
    }}
    got = np.asarray(m.apply(params, jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=1e-5)


def test_conv2d_rule():
    x = np.random.default_rng(0).standard_normal((2, 3, 8, 6)).astype(np.float32)  # NCHW
    tc = torch.nn.Conv2d(3, 5, 3, padding=1)
    want = tc(torch.from_numpy(x)).detach().numpy()
    m = nn.Conv(5, (3, 3), padding=[(1, 1), (1, 1)])
    params = {"params": {
        "kernel": jnp.asarray(conv2d_kernel(tc.weight.detach().numpy())),
        "bias": jnp.asarray(tc.bias.detach().numpy()),
    }}
    got = np.asarray(m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-5)


def test_conv2d_strided_rule():
    """Downsample conv: 3x3 stride 2 pad 1 (unet.py Downsample)."""
    x = np.random.default_rng(0).standard_normal((1, 3, 8, 8)).astype(np.float32)
    tc = torch.nn.Conv2d(3, 3, 3, stride=2, padding=1)
    want = tc(torch.from_numpy(x)).detach().numpy()
    m = nn.Conv(3, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    params = {"params": {
        "kernel": jnp.asarray(conv2d_kernel(tc.weight.detach().numpy())),
        "bias": jnp.asarray(tc.bias.detach().numpy()),
    }}
    got = np.asarray(m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-5)


def test_convtranspose1d_rule():
    """BigVGAN upsampler: ConvTranspose1d(k=16, s=8, p=4)."""
    x = np.random.default_rng(0).standard_normal((1, 4, 10)).astype(np.float32)
    tc = torch.nn.ConvTranspose1d(4, 6, 16, 8, padding=4)
    want = tc(torch.from_numpy(x)).detach().numpy()
    pad = (16 - 1) - 4
    m = nn.ConvTranspose(6, (16,), strides=(8,), padding=[(pad, pad)])
    params = {"params": {
        "kernel": jnp.asarray(convtranspose1d_kernel(tc.weight.detach().numpy())),
        "bias": jnp.asarray(tc.bias.detach().numpy()),
    }}
    got = np.asarray(m.apply(params, jnp.asarray(x.transpose(0, 2, 1))))
    assert got.shape[1] == want.shape[2]
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=1e-5)


def test_convtranspose2d_rule():
    """U-Net upsampler: ConvTranspose2d(k=4, s=2, p=1)."""
    x = np.random.default_rng(0).standard_normal((1, 3, 6, 6)).astype(np.float32)
    tc = torch.nn.ConvTranspose2d(3, 5, 4, 2, padding=1)
    want = tc(torch.from_numpy(x)).detach().numpy()
    m = nn.ConvTranspose(5, (4, 4), strides=(2, 2), padding=[(2, 2), (2, 2)])
    params = {"params": {
        "kernel": jnp.asarray(convtranspose2d_kernel(tc.weight.detach().numpy())),
        "bias": jnp.asarray(tc.bias.detach().numpy()),
    }}
    got = np.asarray(m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert got.shape[1:3] == want.shape[2:]
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-5)


def test_groupnorm_rule():
    x = np.random.default_rng(0).standard_normal((2, 8, 5, 6)).astype(np.float32)
    tg = torch.nn.GroupNorm(2, 8)
    with torch.no_grad():
        tg.weight.copy_(torch.rand(8))
        tg.bias.copy_(torch.rand(8))
    want = tg(torch.from_numpy(x)).detach().numpy()
    m = nn.GroupNorm(num_groups=2, epsilon=1e-5)
    params = {"params": {
        "scale": jnp.asarray(tg.weight.detach().numpy()),
        "bias": jnp.asarray(tg.bias.detach().numpy()),
    }}
    got = np.asarray(m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-4)


def test_weight_norm_folding():
    tc = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 6, 3))
    x = torch.randn(1, 4, 10)
    want = tc(x).detach().numpy()
    sd = {k: v.detach().numpy() for k, v in tc.state_dict().items()}
    gk = [k for k in sd if k.endswith("weight_g") or "original0" in k][0]
    vk = [k for k in sd if k.endswith("weight_v") or "original1" in k][0]
    w = fold_weight_norm(sd[gk], sd[vk])
    plain = torch.nn.Conv1d(4, 6, 3)
    with torch.no_grad():
        plain.weight.copy_(torch.from_numpy(w))
        plain.bias.copy_(torch.from_numpy(sd[[k for k in sd if k.endswith("bias")][0]]))
    got = plain(x).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dense_from_conv1x1():
    x = np.random.default_rng(0).standard_normal((2, 4, 10)).astype(np.float32)
    tc = torch.nn.Conv1d(4, 6, 1)
    want = tc(torch.from_numpy(x)).detach().numpy()  # (2, 6, 10)
    k = dense_from_conv1x1(tc.weight.detach().numpy())
    got = x.transpose(0, 2, 1) @ k + tc.bias.detach().numpy()
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=1e-5)


def test_full_decoder_conversion_structure():
    """Synthesize a reference-shaped torch state dict for a tiny decoder,
    convert, and check it matches our module's param tree exactly."""
    from unitspeech_tpu.models.diffusion import UnitSpeech
    from unitspeech_tpu.utils.torch_convert import assert_tree_match, convert_decoder

    dim, mults, n_feats, spk = 8, (1, 2), 16, 12
    dims = [2] + [dim * m for m in mults]
    sd = {}
    sd["text_uncon"] = np.zeros((1, n_feats, 1), np.float32)
    sd["spk_uncon"] = np.zeros((1, 1, spk), np.float32)
    t_dim = dim + spk

    def resnet(prefix, din, dout):
        sd[f"{prefix}.mlp.1.weight"] = np.zeros((dout, t_dim), np.float32)
        sd[f"{prefix}.mlp.1.bias"] = np.zeros((dout,), np.float32)
        for bn, d_in in (("block1", din), ("block2", dout)):
            sd[f"{prefix}.{bn}.block.0.weight"] = np.zeros((dout, d_in, 3, 3), np.float32)
            sd[f"{prefix}.{bn}.block.0.bias"] = np.zeros((dout,), np.float32)
            sd[f"{prefix}.{bn}.block.1.weight"] = np.ones((dout,), np.float32)
            sd[f"{prefix}.{bn}.block.1.bias"] = np.zeros((dout,), np.float32)
        if din != dout:
            sd[f"{prefix}.res_conv.weight"] = np.zeros((dout, din, 1, 1), np.float32)
            sd[f"{prefix}.res_conv.bias"] = np.zeros((dout,), np.float32)

    def attn(prefix, d):
        sd[f"{prefix}.fn.g"] = np.zeros((1,), np.float32)
        sd[f"{prefix}.fn.fn.to_qkv.weight"] = np.zeros((128 * 3, d, 1, 1), np.float32)
        sd[f"{prefix}.fn.fn.to_out.weight"] = np.zeros((d, 128, 1, 1), np.float32)
        sd[f"{prefix}.fn.fn.to_out.bias"] = np.zeros((d,), np.float32)

    sd["estimator.mlp.0.weight"] = np.zeros((dim * 4, dim), np.float32)
    sd["estimator.mlp.0.bias"] = np.zeros((dim * 4,), np.float32)
    sd["estimator.mlp.2.weight"] = np.zeros((dim, dim * 4), np.float32)
    sd["estimator.mlp.2.bias"] = np.zeros((dim,), np.float32)
    for i in range(len(mults)):
        din, dout = dims[i], dims[i + 1]
        resnet(f"estimator.downs.{i}.0", din, dout)
        resnet(f"estimator.downs.{i}.1", dout, dout)
        attn(f"estimator.downs.{i}.2", dout)
        if i < len(mults) - 1:
            sd[f"estimator.downs.{i}.3.conv.weight"] = np.zeros((dout, dout, 3, 3), np.float32)
            sd[f"estimator.downs.{i}.3.conv.bias"] = np.zeros((dout,), np.float32)
    mid = dims[-1]
    resnet("estimator.mid_block1", mid, mid)
    attn("estimator.mid_attn", mid)
    resnet("estimator.mid_block2", mid, mid)
    for j in range(len(mults) - 1):
        pairs = list(zip(dims[1:-1], dims[2:]))[::-1]
        din, dout = pairs[j]
        resnet(f"estimator.ups.{j}.0", dout * 2, din)
        resnet(f"estimator.ups.{j}.1", din, din)
        attn(f"estimator.ups.{j}.2", din)
        sd[f"estimator.ups.{j}.3.conv.weight"] = np.zeros((din, din, 4, 4), np.float32)
        sd[f"estimator.ups.{j}.3.conv.bias"] = np.zeros((din,), np.float32)
    sd["estimator.final_block.block.0.weight"] = np.zeros((dim, dim, 3, 3), np.float32)
    sd["estimator.final_block.block.0.bias"] = np.zeros((dim,), np.float32)
    sd["estimator.final_block.block.1.weight"] = np.ones((dim,), np.float32)
    sd["estimator.final_block.block.1.bias"] = np.zeros((dim,), np.float32)
    sd["estimator.final_conv.weight"] = np.zeros((1, dim, 1, 1), np.float32)
    sd["estimator.final_conv.bias"] = np.zeros((1,), np.float32)

    converted = convert_decoder(sd, dim=dim, dim_mults=mults)
    model = UnitSpeech(n_feats=n_feats, dim=dim, dim_mults=mults, groups=4, spk_emb_dim=spk)
    target = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, n_feats)), jnp.ones((1, 8)),
        jnp.zeros((1, 8, n_feats)), jnp.zeros((1,)), jnp.zeros((1, spk)),
    )
    assert_tree_match(converted["params"], jax.tree_util.tree_map(np.asarray, target["params"]))
