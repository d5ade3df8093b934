"""Remote data-disk staging (the ``--data_disk hdfs`` path).

The reference forms ``data_dir = data_hdfs_host + data_dir_hdfs`` and lets the
TF runtime's HDFS driver read the files in place
(/root/reference/datasets/cifar10_dataset.py:85-94).  The TPU rebuild's data
layer reads shard files with numpy / the native pread sampler, so the
TPU-native equivalent is the standard TPU-VM pattern: **stage the remote
directory into a local cache once** (primary process only, barrier before
readers start) and point the loaders at the cache.  Staging is delegated to
the ``hdfs dfs`` CLI when the scheme is ``hdfs://``; a ``file://`` host is
supported as a driver-free scheme so the full path is testable in-container.

Cache key = hash of the remote URL; re-runs and resumed searches hit the
cache instead of re-copying.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
import time

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.core.metrics import get_logger

FLAGS.DEFINE_string('data_dir_hdfs', None,
                    'data directory on the remote disk (joined to '
                    '--data_hdfs_host, reference cifar10_dataset.py:92)')
FLAGS.DEFINE_string('data_cache_dir', None,
                    'local cache for staged remote data '
                    '(default ~/.cache/pocketflow_tpu)')
FLAGS.DEFINE_float('data_stage_timeout', 3600.0,
                   'seconds a process waits for another process on the same '
                   'host to finish staging remote data')

# remote URL -> staged local dir, memoized so the cross-process barrier in
# resolve_data_dir runs exactly once per URL per process (every process
# executes the same program, so participation stays consistent)
_RESOLVED: dict = {}


def _cache_root() -> str:
    return FLAGS.get('data_cache_dir') or os.path.join(
        os.path.expanduser('~'), '.cache', 'pocketflow_tpu')


def _stage(remote_url: str, dst: str):
    """Copy remote_url (a directory) to dst via the scheme's tool."""
    log = get_logger()
    tmp = dst + '.staging'
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if remote_url.startswith('file://'):
        src = remote_url[len('file://'):]
        if not os.path.isdir(src):
            raise FileNotFoundError('remote data dir not found: %s' % remote_url)
        shutil.copytree(src, tmp)
    elif remote_url.startswith('hdfs://'):
        hdfs_cli = shutil.which('hdfs') or shutil.which('hadoop')
        if hdfs_cli is None:
            raise RuntimeError(
                'data_disk=hdfs needs the `hdfs` (or `hadoop`) CLI on PATH to '
                'stage %s; install a Hadoop client on the TPU host or copy '
                'the data locally and use data_disk=local' % remote_url)
        sub = ['dfs'] if os.path.basename(hdfs_cli) == 'hdfs' else ['fs']
        os.makedirs(tmp, exist_ok=True)
        subprocess.run([hdfs_cli, *sub, '-copyToLocal', remote_url + '/*', tmp],
                       check=True)
    else:
        raise ValueError('unsupported remote data scheme: %s (expected '
                         'hdfs:// or file://)' % remote_url)
    if os.path.exists(dst):  # lost a race to another launcher on this host
        shutil.rmtree(tmp)
    else:
        os.replace(tmp, dst)
    log.info('staged remote data %s -> %s', remote_url, dst)


def resolve_data_dir() -> str | None:
    """Effective local directory for the configured data disk.

    ``local``: ``--data_dir_local`` as-is.  ``hdfs``: stage
    ``data_hdfs_host + data_dir_hdfs`` into the local cache (primary process
    copies, every process barriers, all return the same cache path).
    """
    disk = FLAGS.get('data_disk') or 'local'
    if disk == 'local':
        return FLAGS.get('data_dir_local')
    if disk != 'hdfs':
        raise ValueError('unrecognized data disk: ' + disk)

    host, rdir = FLAGS.get('data_hdfs_host'), FLAGS.get('data_dir_hdfs')
    if not host or not rdir:
        # reference asserts both are set (cifar10_dataset.py:90-91)
        raise ValueError('data_disk=hdfs requires both --data_hdfs_host and '
                         '--data_dir_hdfs')
    remote_url = host.rstrip('/') + '/' + rdir.lstrip('/')
    if remote_url in _RESOLVED:
        return _RESOLVED[remote_url]
    dst = os.path.join(_cache_root(),
                       hashlib.sha1(remote_url.encode()).hexdigest()[:16])
    from pocketflow_tpu.core import mesh
    if not os.path.isdir(dst):
        _stage_elected(remote_url, dst)
    # every process that reached here synchronizes, whether or not it staged —
    # conditional participation (skip-if-cached) can deadlock when processes
    # disagree about cache presence (hosts with separate disks, or a worker
    # that first checked after the primary's os.replace landed)
    mesh.auto_barrier('stage_remote_data')
    if not os.path.isdir(dst):
        raise RuntimeError(
            'remote data staging left no local copy at %s on this host — '
            'refusing to continue (a silent synthetic-data fallback would '
            'train this process on garbage while others train on %s)'
            % (dst, remote_url))
    _RESOLVED[remote_url] = dst
    return dst


def _stage_elected(remote_url: str, dst: str):
    """Host-local election: exactly one process per filesystem stages; the
    rest wait for the copy to land.  Unlike a global-primary-only copy this
    works on multi-host pods with per-VM disks — each host's winner stages
    its own cache (the reference's HDFS driver read remote files in place,
    so every worker saw the data; the staged cache must too)."""
    os.makedirs(_cache_root(), exist_ok=True)
    lock = dst + '.lock'
    try:
        os.mkdir(lock)
    except FileExistsError:
        deadline = time.time() + float(FLAGS.get('data_stage_timeout') or 3600.0)
        while time.time() < deadline:
            if os.path.isdir(dst) and not os.path.exists(lock):
                return
            time.sleep(0.5)
        raise RuntimeError(
            'timed out waiting for another process to stage %s into %s '
            '(stale lock %s from a crashed run? remove it and retry)'
            % (remote_url, dst, lock))
    try:
        if not os.path.isdir(dst):
            _stage(remote_url, dst)
    finally:
        os.rmdir(lock)
