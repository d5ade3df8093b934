#!/usr/bin/env bash
# Quality gate (rebuild of /root/reference/run_pylint.sh; no pylint in this
# image, so: bytecode-compile every module, import the whole package, and
# verify the test suite collects).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m compileall -q pocketflow_tpu main.py bench.py __graft_entry__.py examples
python - <<'PY'
import importlib, pkgutil, sys
sys.path.insert(0, '.')
import pocketflow_tpu
bad = []
for mod in pkgutil.walk_packages(pocketflow_tpu.__path__, 'pocketflow_tpu.'):
    try:
        importlib.import_module(mod.name)
    except Exception as exc:  # noqa: BLE001
        bad.append((mod.name, exc))
if bad:
    for name, exc in bad:
        print('IMPORT FAIL:', name, exc)
    raise SystemExit(1)
print('all modules import cleanly')
PY
JAX_PLATFORMS=cpu python -m pytest tests/ --collect-only -q | tail -1
echo "lint gate OK"
