"""ctypes binding + builder for the native data runtime (native/pfdata.cc).

The reference's host-side data plane is TensorFlow's C++ tf.data runtime;
ours is libpfdata.so: threaded record parsing and a shuffling batch sampler
with a bounded prefetch queue.  Compiled on demand with g++ (no pybind11 in
the image), cached under ``~/.cache/pocketflow_tpu_native``; every caller
falls back to the NumPy path when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

from pocketflow_tpu.core.metrics import get_logger

log = get_logger()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'native', 'pfdata.cc')


def _build_lib() -> Optional[str]:
    cache_dir = os.environ.get(
        'PF_NATIVE_CACHE_DIR', os.path.expanduser('~/.cache/pocketflow_tpu_native'))
    os.makedirs(cache_dir, exist_ok=True)
    out = os.path.join(cache_dir, 'libpfdata.so')
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return out
    # compile to a process-private temp and os.replace: a killed g++ (or two
    # processes sharing the cache) must never leave a truncated .so at the
    # final path — its fresh mtime would suppress rebuilds forever
    tmp = '%s.%d.tmp' % (out, os.getpid())
    cmd = ['g++', '-O3', '-std=c++17', '-shared', '-fPIC', '-o', tmp, _SRC,
           '-lpthread']
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
        return out
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired, OSError) as exc:
        log.warning('native pfdata build failed (%s); using the NumPy path', exc)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SRC):
        return None
    path = _build_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError as exc:
        # a corrupt cached .so (e.g. from a pre-atomic-write version) must
        # degrade to the NumPy path, not crash data loading; drop the cache
        # so the next run rebuilds
        log.warning('cached libpfdata.so unloadable (%s); rebuilding next '
                    'run, using the NumPy path now', exc)
        try:
            os.unlink(path)
        except OSError:
            pass
        return None
    lib.pfdata_parse_cifar10.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
    lib.pfdata_sampler_create.restype = ctypes.c_void_p
    lib.pfdata_sampler_create.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32]
    lib.pfdata_file_sampler_create.restype = ctypes.c_void_p
    lib.pfdata_file_sampler_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
    lib.pfdata_sampler_next.restype = ctypes.c_int32
    lib.pfdata_sampler_next.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.pfdata_sampler_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def parse_cifar10(raw: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Parse concatenated CIFAR-10 .bin bytes natively; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    record = 1 + 32 * 32 * 3
    nb = raw.size // record
    raw = np.ascontiguousarray(raw[:nb * record], np.uint8)
    images = np.empty((nb, 32, 32, 3), np.uint8)
    labels = np.empty((nb,), np.int32)
    lib.pfdata_parse_cifar10(
        raw.ctypes.data_as(ctypes.c_void_p), nb,
        images.ctypes.data_as(ctypes.c_void_p),
        labels.ctypes.data_as(ctypes.c_void_p))
    return images, labels


class NativeSampler:
    """Threaded shuffling batch iterator backed by libpfdata.

    Deterministic: the batch stream depends only on (seed, batch, shuffle, n)
    — never on nb_threads (the C++ side draws indices under a lock in sequence
    order and delivers completed batches strictly in that order).

    Accepts either flat in-RAM arrays or a file-backed
    :class:`~pocketflow_tpu.datasets.shards.ShardedView`, which streams rows
    out of per-shard ``.npy`` files via ``pread`` with bounded resident memory
    (the ImageNet-scale path; reference equivalent:
    /root/reference/datasets/abstract_dataset.py:55-94's parallel_interleave).
    """

    def __init__(self, images, labels: np.ndarray, batch_size: int,
                 shuffle: bool, seed: int, nb_threads: int = 2,
                 queue_depth: int = 4):
        lib = get_lib()
        if lib is None:
            raise RuntimeError('native pfdata unavailable')
        self._lib = lib
        self._labels = np.ascontiguousarray(labels, np.float32)
        if self._labels.ndim == 1:
            self._labels = self._labels[:, None]
        self.label_shape = self._labels.shape[1:]
        self.batch_size = batch_size
        self._label_is_int = np.issubdtype(labels.dtype, np.integer)
        label_floats = int(np.prod(self.label_shape))

        from pocketflow_tpu.datasets.shards import ShardedView
        if isinstance(images, ShardedView):
            if images.dtype != np.uint8:
                raise RuntimeError('native sampler needs uint8 image shards')
            table = images.file_table()
            if table is None:
                raise RuntimeError('ShardedView is not file-backed')
            paths, offsets, counts = table
            self.image_shape = images.item_shape
            sample_bytes = int(np.prod(self.image_shape))
            index = np.ascontiguousarray(images.global_index(), np.int64)
            offsets_arr = np.asarray(offsets, np.int64)
            counts_arr = np.asarray(counts, np.int64)
            c_paths = (ctypes.c_char_p * len(paths))(
                *[p.encode() for p in paths])
            if len(index) != len(self._labels):
                raise RuntimeError('labels must be pre-gathered to the selection')
            self._handle = lib.pfdata_file_sampler_create(
                c_paths, offsets_arr.ctypes.data_as(ctypes.c_void_p),
                counts_arr.ctypes.data_as(ctypes.c_void_p), len(paths),
                self._labels.ctypes.data_as(ctypes.c_void_p),
                index.ctypes.data_as(ctypes.c_void_p), len(index),
                sample_bytes, label_floats, batch_size,
                1 if shuffle else 0, seed, nb_threads, queue_depth)
            if not self._handle:
                raise RuntimeError('pfdata_file_sampler_create failed '
                                   '(unreadable shard?)')
            return
        # keep references alive: the sampler reads these buffers zero-copy
        self._images = np.ascontiguousarray(images, np.uint8)
        self.image_shape = self._images.shape[1:]
        sample_bytes = int(np.prod(self.image_shape))
        self._handle = lib.pfdata_sampler_create(
            self._images.ctypes.data_as(ctypes.c_void_p),
            self._labels.ctypes.data_as(ctypes.c_void_p),
            len(images), sample_bytes, label_floats, batch_size,
            1 if shuffle else 0, seed, nb_threads, queue_depth)

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        images = np.empty((self.batch_size, *self.image_shape), np.uint8)
        labels = np.empty((self.batch_size, *self.label_shape), np.float32)
        ok = self._lib.pfdata_sampler_next(
            self._handle, images.ctypes.data_as(ctypes.c_void_p),
            labels.ctypes.data_as(ctypes.c_void_p))
        if not ok:
            raise IOError('pfdata: shard read failed mid-stream')
        if self._label_is_int:
            labels = labels.astype(np.int32)
        if labels.shape[-1] == 1 and labels.ndim == 2:
            labels = labels[:, 0]
        return {'image': images, 'label': labels}

    def close(self):
        if getattr(self, '_handle', None):
            self._lib.pfdata_sampler_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
