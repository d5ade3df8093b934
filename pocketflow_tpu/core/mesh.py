"""Device mesh & distributed runtime.

TPU-native replacement for the reference's Horovod/MPI layer
(/root/reference/utils/multi_gpu_wrapper.py:20-98 and utils/misc_utils.py:25-52):

* `MultiGpuWrapper.init/size/rank` -> one global `jax.sharding.Mesh` whose
  "data" axis spans every addressable chip; XLA inserts the all-reduces.
* `auto_barrier(mpi_comm)` -> `multihost_utils.sync_global_devices`.
* `is_primary_worker('global'|'local')` -> `jax.process_index() == 0`.
* rank-0 text-file value sync (pr_optimizer.py:429-445) ->
  `multihost_utils.broadcast_one_to_all` of arrays.

The mesh may carry extra axes ("model" for tensor-parallel layers) — the
reference only ever does data parallelism, but the rebuild exposes the axis so
large dense layers can shard without code changes.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pocketflow_tpu.config import FLAGS

DATA_AXIS = 'data'
MODEL_AXIS = 'model'

_GLOBAL_MESH: Optional[Mesh] = None


def _parse_mesh_shape(spec: str, n_devices: int) -> Tuple[Tuple[str, ...], Tuple[int, ...]]:
    """Parse the `mesh_shape` flag ("data:4,model:2") into axis names/sizes."""
    if not spec:
        return (DATA_AXIS,), (n_devices,)
    names, sizes = [], []
    for part in spec.split(','):
        name, _, size = part.partition(':')
        names.append(name.strip())
        sizes.append(int(size))
    total = int(np.prod(sizes))
    if total != n_devices:
        raise ValueError(
            'mesh_shape %r wants %d devices but %d are available' % (spec, total, n_devices))
    return tuple(names), tuple(sizes)


def build_mesh(devices: Optional[Sequence[jax.Device]] = None,
               axis_names: Optional[Sequence[str]] = None,
               axis_sizes: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_names is None or axis_sizes is None:
        axis_names, axis_sizes = _parse_mesh_shape(FLAGS.get('mesh_shape', ''), n)
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, tuple(axis_names))


def global_mesh() -> Mesh:
    """The process-wide mesh (created lazily on first use)."""
    global _GLOBAL_MESH
    if _GLOBAL_MESH is None:
        _GLOBAL_MESH = build_mesh()
    return _GLOBAL_MESH


def set_global_mesh(mesh: Mesh):
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def reset_global_mesh():
    global _GLOBAL_MESH
    _GLOBAL_MESH = None


def distributed_init():
    """Initialize multi-host JAX if launched under a multi-process runtime.

    Replaces `mgw.init()` + `MPI.COMM_WORLD` (abstract_learner.py:68-74). On a
    single host this is a no-op; under a multi-host TPU slice the coordinator
    env vars are set by the launcher and `jax.distributed.initialize` wires up
    DCN.
    """
    addr = (os.environ.get('JAX_COORDINATOR_ADDRESS')
            or os.environ.get('COORDINATOR_ADDRESS'))
    if addr:
        # pass the env config explicitly: the no-arg initialize only
        # auto-detects managed clusters (SLURM/GKE...), not plain env vars
        kwargs = {'coordinator_address': addr}
        if os.environ.get('JAX_NUM_PROCESSES'):
            kwargs['num_processes'] = int(os.environ['JAX_NUM_PROCESSES'])
        if os.environ.get('JAX_PROCESS_ID'):
            kwargs['process_id'] = int(os.environ['JAX_PROCESS_ID'])
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError:
            pass  # already initialized


def num_workers() -> int:
    """Global data-parallel degree (reference: mgw.size())."""
    return global_mesh().shape.get(DATA_AXIS, 1)


def worker_rank() -> int:
    """This process's index (reference: mgw.rank())."""
    return jax.process_index()


def is_primary_worker(scope: str = 'global') -> bool:
    """Whether this process is the primary worker (misc_utils.py:37-52)."""
    if scope == 'global':
        return jax.process_index() == 0
    if scope == 'local':
        return jax.process_index() == 0  # one process per host under JAX
    raise ValueError('unrecognized worker scope: ' + scope)


def auto_barrier(name: str = 'pf_barrier'):
    """Cross-process barrier; no-op single-process (misc_utils.py:25-35)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def broadcast_from_primary(tree):
    """Broadcast a pytree of arrays from process 0 to all processes.

    Replaces the reference's save-to-text-file + MPI.Barrier + re-read idiom
    (pr_optimizer.py:429-445, bit_optimizer.py:352-365).
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(tree)


# -- sharding helpers ---------------------------------------------------------

# leaves smaller than this stay replicated even under tensor parallelism
# (sharding tiny vectors costs more in collectives than it saves in memory)
_TP_MIN_SIZE = 1 << 16


def infer_tp_sharding(tree, mesh: Optional[Mesh] = None):
    """Tensor-parallel sharding tree: shard each large leaf's LAST axis over
    the 'model' mesh axis when divisible; everything else replicated.

    This is the reference-free part of the rebuild (SURVEY.md §2.6: the
    reference is DP-only; the mesh exposes the extra axis so big dense/conv
    kernels shard without code changes).  XLA's sharding propagation inserts
    the matching activation collectives.
    """
    mesh = mesh or global_mesh()
    model_size = mesh.shape.get(MODEL_AXIS, 1)

    def leaf_sharding(leaf):
        shape = getattr(leaf, 'shape', None)
        if (model_size > 1 and shape and len(shape) >= 1
                and int(np.prod(shape)) >= _TP_MIN_SIZE
                and shape[-1] % model_size == 0):
            spec = [None] * (len(shape) - 1) + [MODEL_AXIS]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(leaf_sharding, tree)

def data_sharding(mesh: Optional[Mesh] = None) -> NamedSharding:
    """Sharding for a batch: leading axis split over the data axis."""
    mesh = mesh or global_mesh()
    return NamedSharding(mesh, P(DATA_AXIS))

def replicated_sharding(mesh: Optional[Mesh] = None) -> NamedSharding:
    mesh = mesh or global_mesh()
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Optional[Mesh] = None):
    """Place a host-local batch onto the mesh, split along axis 0.

    SINGLE-PROCESS only (device_put of host-local data to a cross-process
    sharding is wrong): production code goes through
    ``AbstractLearner.put_batch``, which assembles global batches with
    ``make_array_from_process_local_data`` under multi-host."""
    if jax.process_count() > 1:
        raise RuntimeError('shard_batch is single-process only; use '
                           'AbstractLearner.put_batch for multi-host batch '
                           'assembly')
    mesh = mesh or global_mesh()

    def _put(x):
        return jax.device_put(x, NamedSharding(
            mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(_put, batch)


@functools.lru_cache(maxsize=None)
def cpu_test_mesh(n: int = 8) -> Mesh:
    """A host-platform mesh for tests (requires xla_force_host_platform_device_count)."""
    devices = jax.devices()[:n]
    return Mesh(np.asarray(devices).reshape(n), (DATA_AXIS,))
