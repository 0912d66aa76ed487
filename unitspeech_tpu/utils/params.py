"""Parameter-tree utilities.

host_random_params: materialize a module's init tree WITHOUT running the
init program on device. jax.eval_shape traces init (no execution, no
compile), the tree is filled with host randomness, and one device_put ships
it — the exact cost profile of a real checkpoint load (disk -> host -> one
H2D). On the tunneled TPU this matters a lot: jit(init) of WavLM-Large
loads a ~150 MB init EXECUTABLE onto the remote server, measured 146-344 s
per process even on a persistent-compile-cache hit (ROADMAP r5), a cost no
checkpoint-loading session pays.
"""

from __future__ import annotations

import numpy as np


def host_random_params(model, init_args, seed: int = 0, scale: float = 0.02):
    """Random param tree for `model` with init's structure/shapes/dtypes,
    built host-side. Float leaves ~ N(0, scale); everything else zeros."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(model.init, *init_args)
    rng = np.random.default_rng(seed)

    def fill(s):
        if np.issubdtype(s.dtype, np.floating):
            return jnp.asarray(
                (scale * rng.standard_normal(s.shape)).astype(s.dtype)
            )
        return jnp.zeros(s.shape, s.dtype)

    return jax.tree_util.tree_map(fill, shapes)
