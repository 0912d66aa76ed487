"""Multi-host launch helper: one call makes a TPU-pod training process
cluster-aware.

The reference has no launcher at all (single-GPU scripts; its only
distributed tool is the gloo-based transcriber,
textlesslib tools/distributed_transcribe/transcribe.py:100-120). The
TPU-native story is JAX's built-in cluster bootstrap: on Cloud TPU pods
`jax.distributed.initialize()` discovers the coordinator and process count
from the TPU metadata server, after which `jax.devices()` spans the whole
pod and the Mesh helpers (parallel/mesh.py) lay out data/model axes across
it. `TrainLoop` already shards input files by `jax.process_index()` and
writes checkpoints from process 0 only.

Launch pattern (tools/tpu_pod_run.sh wraps this):

    gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
      --command="cd repo && python -m unitspeech_tpu.cli train-step1 \
                 --distributed --filelist data/train.txt ..."
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed if this looks like (or is declared to be)
    a multi-process launch; idempotent; returns True when a cluster was (or
    already is) initialized.

    Resolution order:
      1. explicit arguments;
      2. UNITSPEECH_COORDINATOR / UNITSPEECH_NUM_PROCESSES /
         UNITSPEECH_PROCESS_ID environment variables (any launcher can set
         these — SLURM/MPI users map their rank variables onto them);
      3. no arguments at all: `jax.distributed.initialize()` with JAX's own
         auto-detection — correct on Cloud TPU pods, where the TPU metadata
         server provides the topology.
    """
    import jax

    if getattr(jax.distributed, "is_initialized", None) and jax.distributed.is_initialized():
        return True

    coordinator_address = coordinator_address or os.environ.get(
        "UNITSPEECH_COORDINATOR"
    )
    if num_processes is None and "UNITSPEECH_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["UNITSPEECH_NUM_PROCESSES"])
    if process_id is None and "UNITSPEECH_PROCESS_ID" in os.environ:
        process_id = int(os.environ["UNITSPEECH_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # TPU-pod auto-detection path
        jax.distributed.initialize()
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
