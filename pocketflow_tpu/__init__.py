"""PocketFlow-TPU: a TPU-native (JAX/XLA/Pallas/pjit) model-compression framework.

A ground-up rebuild of the capabilities of Tencent/PocketFlow (reference at
/root/reference, TF-1.x graph mode) as a functional JAX framework:

* learners (compression algorithms) are pure transformations of parameter
  pytrees fused into one jitted train step — no graph surgery;
* data parallelism is a `jax.sharding.Mesh` "data" axis with XLA collectives
  over ICI — no Horovod/NCCL/MPI;
* fake-quant / masking hot ops are Pallas TPU kernels with `jax.custom_vjp`
  straight-through estimators — no gradient_override_map hacks;
* checkpoints are orbax/flax-serialized pytrees — no .meta graph round-trips.

Public API mirrors the reference: model helpers (`pocketflow_tpu.nets`),
datasets (`pocketflow_tpu.datasets`), learners via `create_learner`
(`pocketflow_tpu.learners`), and a reference-compatible flag namespace
(`pocketflow_tpu.config.FLAGS`).
"""

__version__ = '0.1.0'

import os as _os

import jax as _jax

# Persistent XLA compilation cache: ResNet-scale programs take O(min) to
# compile through the remote-compile tunnel; cache them across processes.
try:
    _cache_dir = _os.environ.get('PF_XLA_CACHE_DIR',
                                 _os.path.expanduser('~/.cache/pocketflow_tpu_xla'))
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update('jax_compilation_cache_dir', _cache_dir)
    _jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

from pocketflow_tpu.config import FLAGS  # noqa: F401
from pocketflow_tpu.datasets import abstract as _dataset_flags  # noqa: F401  (registers flags)
from pocketflow_tpu.learners import register_all_flags as _register_all_flags

_register_all_flags()  # full reference flag surface available before CLI parse
