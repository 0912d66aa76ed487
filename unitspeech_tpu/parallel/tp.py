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

Collective-cost note: uniform cout-only sharding means every kernel's cin
stays replicated, so GSPMD all-gathers the channel-sharded activation at each
layer boundary (there is no Megatron column->row pairing here). On an ICI
mesh at these activation sizes the gathers are small, but the projected
deep-stage latency win is UNMEASURED (no multi-chip hardware in this
environment) — benchmark on a real slice before relying on TP for latency;
alternating cout/cin sharding for paired layers (turning gathers into
reduce-scatters) is the next step if the gathers dominate.

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


# Leaf names whose last dim is a genuine output-channel contraction output
# (flax Conv / ConvTranspose / Dense all name their weight 'kernel').
# Embedding tables ('embedding') and rel-position tables are lookup-indexed,
# not contracted — sharding their last dim is numerically safe under GSPMD
# but forces extra gathers on lookup-heavy leaves, so they stay replicated.
SHARDED_LEAF_NAMES = ("kernel",)


def _leaf_name(path) -> str:
    last = path[-1]
    for attr in ("key", "name", "idx"):
        if hasattr(last, attr):
            return str(getattr(last, attr))
    return str(last)


def tp_spec_tree(params, mesh: Mesh, model_axis: str = "model",
                 min_per_shard: int = 1, leaf_names=SHARDED_LEAF_NAMES):
    """Pytree of PartitionSpecs mirroring `params` (see `tp_spec`); only
    leaves named in `leaf_names` are considered (pass None to apply the bare
    shape rule to every leaf)."""
    n = mesh.shape[model_axis]

    def spec(path, x):
        if leaf_names is not None and _leaf_name(path) not in leaf_names:
            return P()
        return tp_spec(x, n, model_axis, min_per_shard)

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_tp(params, mesh: Mesh, model_axis: str = "model",
                    min_per_shard: int = 1, leaf_names=SHARDED_LEAF_NAMES):
    """Place a parameter pytree with output-channel tensor parallelism over
    `model_axis` (other mesh axes see the params replicated). The returned
    committed arrays carry their shardings into any jitted program that
    consumes them — no in_shardings plumbing needed."""
    specs = tp_spec_tree(params, mesh, model_axis, min_per_shard, leaf_names)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
