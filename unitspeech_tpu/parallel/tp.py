"""Tensor parallelism: weight-stationary GSPMD channel sharding.

The reference is single-GPU — no tensor parallelism exists to translate
(SURVEY.md §2.5). This is the TPU-native design: instead of Megatron-style
hand-written column/row-parallel layers, every conv / dense kernel shards its
OUTPUT-CHANNEL (last) dim over the mesh's `model` axis via `jax.device_put`
with a `NamedSharding`, and XLA's GSPMD partitioner propagates activation
shardings through the network and inserts the all-gathers / reduce-scatters
on ICI. The model code is untouched — sharding is a placement decision, not
a rewrite (the scaling-book recipe: pick a mesh, annotate, let XLA insert
collectives).

Scope note (measured context): at UnitSpeech's ~30M-param decoder the primary
multi-chip latency axis is SEQUENCE sharding (`reverse_diffusion(mesh,
sample_spec)` — ROADMAP.md 4-chip projection ~0.037 RTF); channel sharding
adds a second axis for the deep stages (C=1024 at 43 frames, where the frame
axis is too short to split further) and composes with it on a (seq, model)
mesh. Numerics are validated against the replicated program on the virtual
8-device mesh (tests/test_tp.py; __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_spec(x, n_model: int, model_axis: str = "model",
            min_per_shard: int = 1) -> P:
    """PartitionSpec for one parameter leaf: shard the last dim over
    `model_axis` when it is a weight matrix/kernel (ndim >= 2) whose output
    channels divide evenly with at least `min_per_shard` per device;
    replicate everything else (biases, norm scales, scalars, embeddings with
    odd sizes)."""
    shape = getattr(x, "shape", ())
    if (
        len(shape) >= 2
        and n_model > 1
        and shape[-1] % n_model == 0
        and shape[-1] // n_model >= min_per_shard
    ):
        return P(*([None] * (len(shape) - 1)), model_axis)
    return P()


def tp_spec_tree(params, mesh: Mesh, model_axis: str = "model",
                 min_per_shard: int = 1):
    """Pytree of PartitionSpecs mirroring `params` (see `tp_spec`)."""
    n = mesh.shape[model_axis]
    return jax.tree_util.tree_map(
        lambda x: tp_spec(x, n, model_axis, min_per_shard), params
    )


def shard_params_tp(params, mesh: Mesh, model_axis: str = "model",
                    min_per_shard: int = 1):
    """Place a parameter pytree with output-channel tensor parallelism over
    `model_axis` (other mesh axes see the params replicated). The returned
    committed arrays carry their shardings into any jitted program that
    consumes them — no in_shardings plumbing needed."""
    specs = tp_spec_tree(params, mesh, model_axis, min_per_shard)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
