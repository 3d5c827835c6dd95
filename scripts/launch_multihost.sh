#!/usr/bin/env bash
# Multi-host launcher (reference: script/srun_multi_node.sh /
# ssh_multi_node.sh). One process per host; process 0 is the controller
# (scheduler + HTTP). Under SLURM the env derives automatically.
#
#   COORDINATOR=host0:8476 NUM_PROCESSES=2 PROCESS_ID=$i \
#     bash scripts/launch_multihost.sh models=Llama-3-8B-Instruct ...
set -euo pipefail
export CHITU_TPU_COORDINATOR="${COORDINATOR:-${SLURM_LAUNCH_NODE_IPADDR:-localhost}:8476}"
export CHITU_TPU_NUM_PROCESSES="${NUM_PROCESSES:-${SLURM_NTASKS:-1}}"
export CHITU_TPU_PROCESS_ID="${PROCESS_ID:-${SLURM_PROCID:-0}}"
exec python -m chitu_tpu.serve \
  "infer.coordinator=${CHITU_TPU_COORDINATOR}" \
  "infer.num_processes=${CHITU_TPU_NUM_PROCESSES}" \
  "infer.process_id=${CHITU_TPU_PROCESS_ID}" \
  "$@"
