#!/usr/bin/env bash
# Local launcher (rebuild of /root/reference/scripts/run_local.sh:38-48).
# The reference copies <net>_run.py to main.py and launches 1 python process
# per GPU under mpirun; on TPU one process drives every local chip through
# the mesh, and multi-host slices use the platform launcher with
# jax.distributed (no mpirun).
#
# Usage: ./scripts/run_local.sh <model_name> [--flag=value ...]
#   e.g. ./scripts/run_local.sh resnet_at_cifar10 --learner=weight-sparse
set -euo pipefail
cd "$(dirname "$0")/.."
MODEL="${1:?usage: run_local.sh <model_name> [flags...]}"
shift || true
exec python main.py --model="${MODEL}" "$@"
