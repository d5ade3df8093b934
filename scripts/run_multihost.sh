#!/usr/bin/env bash
# Launch an N-process data-parallel training run on ONE machine (the local
# stand-in for a multi-host TPU slice; reference: scripts/run_local.sh's
# `mpirun -np N python main.py --enbl_multi_gpu`, main.sh:36-46).
#
# Each process becomes one "host" of the jax.distributed job: datasets shard
# by process, gradients all-reduce across the mesh, checkpoints/eval run on
# the primary worker — the same code path a real multi-host slice takes over
# DCN (there, the TPU launcher sets the coordinator env vars instead).
#
#   ./scripts/run_multihost.sh 2 resnet_at_cifar10 --learner=full-prec \
#       --synthetic_data --nb_smpls_train=512 --nb_epochs_rat=0.01
#
# On CPU (no TPU attached) each process gets one virtual device.

set -euo pipefail
NP="${1:?usage: run_multihost.sh <nb_processes> <model> [flags...]}"
MODEL="${2:?usage: run_multihost.sh <nb_processes> <model> [flags...]}"
shift 2
PORT="${PF_COORD_PORT:-12355}"
cd "$(dirname "$0")/.."

pids=()
for ((i = 0; i < NP; i++)); do
  JAX_COORDINATOR_ADDRESS="127.0.0.1:${PORT}" \
  JAX_NUM_PROCESSES="${NP}" \
  JAX_PROCESS_ID="${i}" \
  python main.py --model="${MODEL}" "$@" &
  pids+=($!)
done
rc=0
for pid in "${pids[@]}"; do
  wait "${pid}" || rc=$?
done
exit "${rc}"
