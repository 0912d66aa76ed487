"""AOT program cache: skip TRACING, not just XLA compilation.

The persistent XLA cache (utils/compile_cache.py) replays compiles, but a
fresh process still pays Python tracing + StableHLO lowering — measured
~40 s for the full-size 500-iter finetune scan on this 1-core box, the
floor of the warm adapt-a-voice session (SSL_BENCH.json). jax.export
serializes the lowered artifact itself; a consumer process deserializes in
milliseconds and its XLA compile of the exported program hits the
persistent cache (measured cross-process on CPU: 20.2 s first build ->
1.4 s consumer, bit-identical outputs).

Usage:
    result, hit = cached_call("finetune-b344-i500", fn, *args)

`fn` must be a pure jit-able function of exactly `*args` (fold statics
into the key and close over them). The on-disk key folds in the jax
version, backend, and every argument's shape/dtype, so a mismatched call
silently falls back to a fresh build. Any export/deserialize failure falls
back to the plain jitted call — the cache is an accelerator, never a
correctness dependency.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Callable, Tuple

DEFAULT_DIR = os.path.expanduser("~/.cache/unitspeech_tpu_aot")


def _aval_digest(args) -> str:
    import jax

    leaves = jax.tree_util.tree_leaves(args)
    parts = []
    for x in leaves:
        shape = getattr(x, "shape", ())
        dtype = getattr(x, "dtype", type(x).__name__)
        parts.append(f"{shape}{dtype}")
    return ";".join(parts)


def _code_fingerprint() -> str:
    """Digest of the package's own source files: ANY code edit invalidates
    every stored artifact, so a stale export can never silently replay
    pre-fix numerics (the cache must never be a correctness dependency)."""
    global _CODE_FP
    if _CODE_FP is None:
        import unitspeech_tpu

        root = os.path.dirname(os.path.abspath(unitspeech_tpu.__file__))
        h = hashlib.sha256()
        for dirpath, dirnames, files in sorted(os.walk(root)):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for f in sorted(files):
                if f.endswith(".py"):
                    h.update(f.encode())
                    with open(os.path.join(dirpath, f), "rb") as fh:
                        h.update(fh.read())
        _CODE_FP = h.hexdigest()[:16]
    return _CODE_FP


_CODE_FP: str | None = None


def cache_path(key: str, args=(), cache_dir: str | None = None) -> str:
    import jax

    backend = jax.default_backend()
    raw = (f"{key}|{jax.__version__}|{backend}|{_code_fingerprint()}"
           f"|{_aval_digest(args)}")
    h = hashlib.sha256(raw.encode()).hexdigest()[:32]
    base = (cache_dir or os.environ.get("UNITSPEECH_AOT_CACHE")
            or DEFAULT_DIR)
    return os.path.join(base, f"{h}.jaxexport")


def cached_fn(key: str, fn: Callable, *args,
              cache_dir: str | None = None) -> Tuple[Callable, bool]:
    """Resolve a REUSABLE jitted callable for fn specialized to `args`'
    shapes, through the AOT artifact cache.

    Returns (callable, hit); hit is True when a stored artifact was
    replayed (no tracing happened). On a miss the artifact is built and
    stored atomically, and the returned callable runs the exported program
    (so its compiled form lands in the persistent XLA cache under the same
    key future consumers hit). Call the result repeatedly — it is a plain
    jitted function."""
    import jax
    from jax import export as jexport

    path = cache_path(key, args, cache_dir)
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exp = jexport.deserialize(f.read())
            return jax.jit(exp.call), True
        except Exception:  # stale/corrupt/other-version artifact
            try:
                os.unlink(path)
            except OSError:
                pass
    jfn = jax.jit(fn)
    try:
        exp = jexport.export(jfn)(*args)
        blob = exp.serialize()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.{os.getpid()}.part"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return jax.jit(exp.call), False
    except Exception:  # pragma: no cover - export-unsupported program
        return jfn, False


def cached_call(key: str, fn: Callable, *args,
                cache_dir: str | None = None) -> Tuple[Any, bool]:
    """One-shot form of `cached_fn`: returns (fn(*args), hit)."""
    f, hit = cached_fn(key, fn, *args, cache_dir=cache_dir)
    return f(*args), hit


def warm(key: str, fn: Callable, *args, cache_dir: str | None = None) -> bool:
    """Build + store the artifact and populate the XLA compile cache,
    WITHOUT executing the computation (lower+compile only — re-warming an
    n-iter training scan must not run n iterations on the device).
    Returns True if an artifact exists afterwards."""
    import jax

    f, _hit = cached_fn(key, fn, *args, cache_dir=cache_dir)
    try:
        jax.jit(f).lower(*args).compile()
    except Exception:  # pragma: no cover - lowering quirk: execute instead
        f(*args)
    return os.path.exists(cache_path(key, args, cache_dir))
