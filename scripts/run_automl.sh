#!/usr/bin/env bash
# AutoML launcher (rebuild of /root/reference/run.sh: the reference submits
# GP-proposed jobs to the 'seven' cluster; here trials run in-process).
# Usage: ./scripts/run_automl.sh <model_name> [--automl_nb_trials=N flags...]
set -euo pipefail
cd "$(dirname "$0")/.."
MODEL="${1:?usage: run_automl.sh <model_name> [flags...]}"
shift || true
exec python -m pocketflow_tpu.automl.cli --model="${MODEL}" "$@"
