"""Device-mesh layout and sharding helpers.

The reference has NO distributed training (single GPU; SURVEY.md §2.5). This
module is the TPU-native replacement: a `jax.sharding.Mesh` over ICI with
named axes

  * `data` — batch (DP): training batches shard on axis 0, parameters
    replicate; XLA inserts the psum for gradient all-reduce when the train
    step is jitted with these shardings.
  * `seq`  — mel-frame axis (sequence/context sharding for long-utterance
    batched inference; a config choice, not a rewrite — see SURVEY.md §5).
  * `model` — output-channel tensor parallelism (weight-stationary GSPMD;
    see `parallel/tp.py`). Size 1 unless requested, so existing (data, seq)
    layouts are unchanged.

Multi-host: `jax.distributed.initialize()` + per-host dataset sharding by
`jax.process_index()` replaces the reference's gloo `range(rank, N, world)`
pattern (textlesslib tools/distributed_transcribe/transcribe.py:109).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    seq: int = 1,
    model: int = 1,
    devices: Optional[Sequence] = None,
    data_axis: str = "data",
    seq_axis: str = "seq",
    model_axis: str = "model",
) -> Mesh:
    """Build a (data, seq, model) mesh. With defaults, all devices go to the
    data axis; the seq/model axes exist (size 1) so PartitionSpecs naming
    them always resolve."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // (seq * model)
    assert data * seq * model == n, f"mesh {data}x{seq}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, seq, model)
    return Mesh(arr, (data_axis, seq_axis, model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Place every array in the batch pytree with axis 0 sharded over
    `data_axis` (host -> devices transfer)."""
    sharding = batch_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate_tree(tree, mesh: Mesh):
    """Replicate a parameter pytree across the mesh."""
    sharding = replicate(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
