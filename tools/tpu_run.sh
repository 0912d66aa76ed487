#!/bin/bash
# Serialize + retry wrapper for TPU jobs: the axon-tunneled TPU takes minutes
# to release after a client disconnects ("No jellyfish device found").
# Usage: tools/tpu_run.sh <logfile> <cmd...>
LOG="$1"; shift
for i in $(seq 1 10); do
  JAX_PLATFORMS=tpu "$@" > "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ] && ! grep -q "No jellyfish device found" "$LOG"; then
    echo "TPU_RUN_OK attempt=$i" >> "$LOG"; exit 0
  fi
  if ! grep -q "No jellyfish device found" "$LOG"; then
    echo "TPU_RUN_FAIL rc=$rc attempt=$i (non-tunnel error)" >> "$LOG"; exit $rc
  fi
  echo "attempt $i: tunnel busy, sleeping 150s" >> "${LOG}.retries"
  sleep 150
done
echo "TPU_RUN_GAVE_UP" >> "$LOG"; exit 1
