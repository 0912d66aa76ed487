"""Test configuration: force an 8-virtual-device CPU platform so sharding and
DP tests run without TPU hardware (SURVEY.md §4).

Env vars are unreliable here (pytest plugins may import jax before this file
runs, and this jax build ignores some env knobs), so use jax.config directly —
config updates apply as long as the backend isn't initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# This JAX build computes float32 matmuls with bf16 passes by default (even on
# CPU); parity tests need true float32 accumulation.
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compile cache: the suite's runtime is dominated by recompiling
# the same tiny-config executables every run; cached, repeat runs are minutes
# faster (utils/compile_cache.py — measured working on CPU and axon TPU).
from unitspeech_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

# Slow-test marking (VERDICT r4 item 8): everything measured >= ~8 s on the
# 1-core box (r5 full run: 458 tests, 20:32 wall) carries `slow`, so
# `pytest -m "not slow"` is the ~8-9 min dev loop; the FULL suite remains
# the CI/verify gate. Prefix match covers parametrized variants.
_SLOW_PREFIXES = (
    "tests/test_cfg_cache.py::test_strided_real_module_masked_and_finite",
    "tests/test_cli.py::test_cli_finetune_then_inference",
    "tests/test_cli.py::test_warmup_adapt_artifact_replays_in_finetune",
    "tests/test_cli_preprocess.py::test_preprocess_spk_embs_and_uncond",
    "tests/test_cli_train.py::test_train_step1_cli_one_epoch",
    "tests/test_cli_train_vocoder.py::test_train_vocoder_cli",
    "tests/test_diffusion.py::test_cfg_batching",
    "tests/test_diffusion.py::test_diffusion_loss_finite_and_differentiable",
    "tests/test_diffusion.py::test_fine_tune_loss_runs",
    "tests/test_discriminators.py::test_mpd_shapes_and_losses",
    "tests/test_encoder.py::test_encoder_dropout_rng_path",
    "tests/test_espeak.py::test_espeak_wrapper_with_stub",
    "tests/test_espeak.py::test_punctuation_edge_cases",
    "tests/test_espeak.py::test_punctuation_preserved",
    "tests/test_espeak_golden.py::test_golden_phonemization",
    "tests/test_eval_driver.py::test_per_speaker_driver",
    "tests/test_hf_ssl_parity.py::",
    "tests/test_ode_sampler.py::test_ode_sampler_cfg_rows_smoke",
    "tests/test_pallas_kernels.py::test_snake_poly_matches_jnp_at_bf16",
    "tests/test_pallas_resample.py::test_estimator_resample_routing_parity",
    "tests/test_pallas_resnet.py::test_estimator_pallas_resnet_parity",
    "tests/test_reference_parity.py::test_cfg_score_parity",
    "tests/test_serve.py::test_refresh_window_from_served_traffic",
    "tests/test_serve.py::test_single_request_roundtrip",
    "tests/test_sharded_inference.py::test_data_sharded_sampler_runs",
    "tests/test_sharded_inference.py::test_seq_sharded_sampler_matches_unsharded",
    "tests/test_ssl.py::test_ecapa_embedding_shape",
    "tests/test_tacotron2.py::test_gslm_example_ulm_and_sampling",
    "tests/test_tacotron2.py::test_resynthesis_example_tiny_stack",
    "tests/test_tacotron2.py::test_speaker_probing_example",
    "tests/test_ssl.py::test_wavlm_runs_with_gated_relpos",
    "tests/test_tp.py::test_tp_dp_train_step_matches_replicated",
    "tests/test_tp.py::test_tp_sampler_matches_replicated",
    "tests/test_train_steps.py::test_finetune_batched_matches_sequential_on_mesh",
    "tests/test_train_steps.py::test_step1_train_step_updates_all_modules",
    "tests/test_train_steps.py::test_step2_train_step_freezes_decoder",
    "tests/test_tts_e2e.py::test_warmup_covers_served_grid",
    "tests/test_vocoder_gan.py::test_vocoder_gan_steps",
    "tests/test_vocoder_pallas.py::test_bigvgan_pallas_large_kernels_and_block2",
    "tests/test_vocoder_pallas.py::test_bigvgan_pallas_path_matches_xla_path",
)


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.nodeid.startswith(_SLOW_PREFIXES):
            item.add_marker(pytest.mark.slow)
