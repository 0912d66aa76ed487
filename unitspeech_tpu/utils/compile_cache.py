"""Persistent XLA compilation cache.

Compiles are the dominant fixed cost in this project's environment (1 CPU
core + remote TPU compile: the full U-Net scan takes ~8-12 min to compile,
and every process starts cold). JAX's persistent compilation cache works on
both the CPU backend and the axon-tunneled TPU backend (measured: an 80 s
cold compile replays in <0.1 s from a second process), so every entry point
— bench, tests, tools, the serving CLI — opts in via this helper.

The cache key covers the platform, compiler options, and the HLO itself, so
CPU/TPU entries coexist and stale hits are not a correctness concern.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/unitspeech_tpu_xla")


def enable(path: str = DEFAULT_DIR) -> bool:
    """Turn on the persistent compile cache (idempotent, best-effort)."""
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # default min_compile_time (1 s) skips trivial executables; the big
        # sampler/training programs are the ones worth persisting
        return True
    except Exception:  # pragma: no cover - old jax or read-only fs
        return False
