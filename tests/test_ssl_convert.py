"""Structural tests: fairseq/unilm-shaped state dicts convert to EXACTLY the
param trees our SSL modules expect (no missing/extra leaves)."""

import jax
import jax.numpy as jnp
import numpy as np

from unitspeech_tpu.models.speaker import EcapaTdnn
from unitspeech_tpu.models.ssl.hubert import HubertConfig, HubertModel
from unitspeech_tpu.models.ssl.wavlm import WavLMConfig, WavLMModel
from unitspeech_tpu.utils.torch_convert import assert_tree_match
from unitspeech_tpu.utils.torch_convert_ssl import (
    convert_ecapa,
    convert_ssl_encoder,
    fold_weight_norm_dim,
)

TINY_CONVS = ((8, 10, 5), (8, 3, 2), (8, 2, 2))


def _ssl_state_dict(dim, layers, mode, gru=False, relpos=False, ffn=16, heads=2,
                    pos_k=8, pos_groups=2, buckets=320):
    sd = {}
    for i, (c, k, s) in enumerate(TINY_CONVS):
        cin = 1 if i == 0 else TINY_CONVS[i - 1][0]
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = np.zeros((c, cin, k), np.float32)
        if mode == "layer_norm":
            sd[f"feature_extractor.conv_layers.{i}.0.bias"] = np.zeros((c,), np.float32)
            sd[f"feature_extractor.conv_layers.{i}.2.1.weight"] = np.ones((c,), np.float32)
            sd[f"feature_extractor.conv_layers.{i}.2.1.bias"] = np.zeros((c,), np.float32)
        elif i == 0:
            sd["feature_extractor.conv_layers.0.2.weight"] = np.ones((c,), np.float32)
            sd["feature_extractor.conv_layers.0.2.bias"] = np.zeros((c,), np.float32)
    c_out = TINY_CONVS[-1][0]
    sd["layer_norm.weight"] = np.ones((c_out,), np.float32)
    sd["layer_norm.bias"] = np.zeros((c_out,), np.float32)
    if c_out != dim:
        sd["post_extract_proj.weight"] = np.zeros((dim, c_out), np.float32)
        sd["post_extract_proj.bias"] = np.zeros((dim,), np.float32)
    sd["encoder.pos_conv.0.weight_g"] = np.ones((1, 1, pos_k), np.float32)
    sd["encoder.pos_conv.0.weight_v"] = np.ones((dim, dim // pos_groups, pos_k), np.float32)
    sd["encoder.pos_conv.0.bias"] = np.zeros((dim,), np.float32)
    sd["encoder.layer_norm.weight"] = np.ones((dim,), np.float32)
    sd["encoder.layer_norm.bias"] = np.zeros((dim,), np.float32)
    for i in range(layers):
        lp = f"encoder.layers.{i}"
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{lp}.self_attn.{n}.weight"] = np.zeros((dim, dim), np.float32)
            sd[f"{lp}.self_attn.{n}.bias"] = np.zeros((dim,), np.float32)
        if gru:
            dh = dim // heads
            sd[f"{lp}.self_attn.grep_linear.weight"] = np.zeros((8, dh), np.float32)
            sd[f"{lp}.self_attn.grep_linear.bias"] = np.zeros((8,), np.float32)
            sd[f"{lp}.self_attn.grep_a"] = np.ones((1, heads, 1, 1), np.float32)
        if relpos and i == 0:
            sd[f"{lp}.self_attn.relative_attention_bias.weight"] = np.zeros(
                (buckets, heads), np.float32
            )
        sd[f"{lp}.self_attn_layer_norm.weight"] = np.ones((dim,), np.float32)
        sd[f"{lp}.self_attn_layer_norm.bias"] = np.zeros((dim,), np.float32)
        sd[f"{lp}.fc1.weight"] = np.zeros((ffn, dim), np.float32)
        sd[f"{lp}.fc1.bias"] = np.zeros((ffn,), np.float32)
        sd[f"{lp}.fc2.weight"] = np.zeros((dim, ffn), np.float32)
        sd[f"{lp}.fc2.bias"] = np.zeros((dim,), np.float32)
        sd[f"{lp}.final_layer_norm.weight"] = np.ones((dim,), np.float32)
        sd[f"{lp}.final_layer_norm.bias"] = np.zeros((dim,), np.float32)
    return sd


def test_hubert_conversion_structure():
    cfg = HubertConfig(
        conv_layers=TINY_CONVS, embed_dim=16, num_layers=2, num_heads=2,
        ffn_dim=16, conv_pos=8, conv_pos_groups=2,
    )
    model = HubertModel(cfg)
    target = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 400)))
    sd = _ssl_state_dict(16, 2, "group_norm")
    converted = convert_ssl_encoder(
        sd, num_layers=2, extractor_mode="group_norm", num_conv_layers=3
    )
    assert_tree_match(
        converted["params"], jax.tree_util.tree_map(np.asarray, target["params"])
    )


def test_wavlm_conversion_structure():
    cfg = WavLMConfig(
        conv_layers=TINY_CONVS, embed_dim=16, num_layers=2, num_heads=2,
        ffn_dim=16, conv_pos=8, conv_pos_groups=2,
    )
    model = WavLMModel(cfg)
    target = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 400)))
    sd = _ssl_state_dict(16, 2, "layer_norm", gru=True, relpos=True)
    converted = convert_ssl_encoder(
        sd, num_layers=2, extractor_mode="layer_norm", num_conv_layers=3,
        gru_rel_pos=True, relative_position_embedding=True,
    )
    assert_tree_match(
        converted["params"], jax.tree_util.tree_map(np.asarray, target["params"])
    )


def test_pos_conv_weight_norm_dim2():
    v = np.random.default_rng(0).standard_normal((4, 2, 8)).astype(np.float32)
    g = np.random.default_rng(1).random((1, 1, 8)).astype(np.float32)
    w = fold_weight_norm_dim(g, v, dim=2)
    # each kernel-position slice has norm g[..., k]
    for k in range(8):
        np.testing.assert_allclose(
            np.linalg.norm(w[:, :, k]), g[0, 0, k], rtol=1e-5
        )


def _ecapa_state_dict(feat_dim=16, channels=16, emb=8, scale=4, n_hidden=3):
    sd = {"feature_weight": np.zeros((n_hidden,), np.float32)}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = np.ones((c,), np.float32)
        sd[f"{prefix}.bias"] = np.zeros((c,), np.float32)
        sd[f"{prefix}.running_mean"] = np.zeros((c,), np.float32)
        sd[f"{prefix}.running_var"] = np.ones((c,), np.float32)

    def conv_relu_bn(prefix, cin, cout, k):
        sd[f"{prefix}.conv.weight"] = np.zeros((cout, cin, k), np.float32)
        sd[f"{prefix}.conv.bias"] = np.zeros((cout,), np.float32)
        bn(f"{prefix}.bn", cout)

    conv_relu_bn("layer1", feat_dim, channels, 5)
    width = channels // scale
    for name in ("layer2", "layer3", "layer4"):
        conv_relu_bn(f"{name}.Conv1dReluBn1", channels, channels, 1)
        conv_relu_bn(f"{name}.Conv1dReluBn2", channels, channels, 1)
        for i in range(scale - 1):
            sd[f"{name}.Res2Conv1dReluBn.convs.{i}.weight"] = np.zeros(
                (width, width, 3), np.float32
            )
            sd[f"{name}.Res2Conv1dReluBn.convs.{i}.bias"] = np.zeros((width,), np.float32)
            bn(f"{name}.Res2Conv1dReluBn.bns.{i}", width)
        sd[f"{name}.SE_Connect.linear1.weight"] = np.zeros((128, channels), np.float32)
        sd[f"{name}.SE_Connect.linear1.bias"] = np.zeros((128,), np.float32)
        sd[f"{name}.SE_Connect.linear2.weight"] = np.zeros((channels, 128), np.float32)
        sd[f"{name}.SE_Connect.linear2.bias"] = np.zeros((channels,), np.float32)
    cat = channels * 3
    sd["conv.weight"] = np.zeros((1536, cat, 1), np.float32)
    sd["conv.bias"] = np.zeros((1536,), np.float32)
    sd["pooling.linear1.weight"] = np.zeros((128, 1536, 1), np.float32)
    sd["pooling.linear1.bias"] = np.zeros((128,), np.float32)
    sd["pooling.linear2.weight"] = np.zeros((1536, 128, 1), np.float32)
    sd["pooling.linear2.bias"] = np.zeros((1536,), np.float32)
    bn("bn", 1536 * 2)
    sd["linear.weight"] = np.zeros((emb, 1536 * 2), np.float32)
    sd["linear.bias"] = np.zeros((emb,), np.float32)
    return sd


def test_ecapa_conversion_structure():
    model = EcapaTdnn(feat_dim=16, channels=16, emb_dim=8, n_hidden_states=3)
    hidden = jnp.zeros((3, 1, 30, 16))
    target = model.init(jax.random.PRNGKey(0), hidden)
    sd = _ecapa_state_dict(scale=8)
    converted = convert_ecapa(sd, res2_scale=8)
    assert_tree_match(
        converted["params"], jax.tree_util.tree_map(np.asarray, target["params"])
    )
    assert_tree_match(
        converted["batch_stats"],
        jax.tree_util.tree_map(np.asarray, target["batch_stats"]),
    )
