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
