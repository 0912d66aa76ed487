#!/usr/bin/env bash
# Run a unitspeech_tpu command on every worker of a Cloud TPU pod slice.
#
# The reference has no launcher (single-GPU scripts). On TPU pods the same
# training entry point runs once per host; `--distributed` makes each
# process call jax.distributed.initialize() (auto topology from the TPU
# metadata server), after which jax.devices() spans the pod, the Mesh
# helpers shard over it, and TrainLoop's per-host input sharding
# (jax.process_index()) splits the filelist.
#
# Usage:
#   tools/tpu_pod_run.sh <tpu-name> <zone> python -m unitspeech_tpu.cli \
#       train-step1 --distributed --filelist data/train.txt --config cfg.json
#
# Requirements: gcloud authenticated; the repo present at the same path on
# every worker (use `gcloud ... scp --worker=all` or a shared disk).
set -euo pipefail

TPU_NAME=${1:?tpu name}
ZONE=${2:?zone}
shift 2

exec gcloud compute tpus tpu-vm ssh "$TPU_NAME" \
  --zone "$ZONE" \
  --worker=all \
  --command="cd $(pwd) && $*"
