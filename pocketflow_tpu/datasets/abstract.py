"""Abstract dataset: host-side pipeline feeding the TPU, augmentation on device.

Rebuild of /root/reference/datasets/abstract_dataset.py:35-111.  The reference
pipeline is tf.data: file list -> shard(nb_workers, rank) -> parallel_interleave
-> map(parse_fn) -> [take/skip split] -> shuffle_and_repeat -> batch -> prefetch.

TPU-native redesign:
* the host side only shuffles/batches raw records (cheap, NumPy, background
  thread prefetch) — every worker shards by `jax.process_index()` exactly like
  the reference shards by Horovod rank (abstract_dataset.py:80-81);
* *all* per-pixel work (normalize, pad-crop-flip, resize) happens on device
  inside the jitted train step via the dataset's `augment` function, so the
  augmentation rides the VPU instead of host CPUs and the batch transfers as
  uint8 (4x less PCIe/DMA traffic than float32).

Per-dataset sample counts / class counts / batch sizes live in a
`DatasetSpec`; the reference's flags of the same names (nb_classes,
nb_smpls_train, batch_size, ...) are honored as overrides when set.
"""

from __future__ import annotations

import queue
import threading
from abc import ABC, abstractmethod
from dataclasses import dataclass, replace
from typing import Dict, Iterator, Optional, Tuple

import jax
import numpy as np

from pocketflow_tpu.config import FLAGS

# Reference defines these once per dataset module at import; here they are
# central overrides (None = use the dataset's own spec defaults).
FLAGS.DEFINE_integer('nb_classes', None, '# of classes (override)')
FLAGS.DEFINE_integer('nb_smpls_train', None, '# of samples for training (override)')
FLAGS.DEFINE_integer('nb_smpls_val', None, '# of samples for validation (override)')
FLAGS.DEFINE_integer('nb_smpls_eval', None, '# of samples for evaluation (override)')
FLAGS.DEFINE_integer('batch_size', None, 'batch size per chip for training (override)')
FLAGS.DEFINE_integer('batch_size_eval', None, 'batch size for evaluation (override)')
FLAGS.DEFINE_string('data_dir_local', None, 'data directory - local')
FLAGS.DEFINE_boolean('enbl_native_loader', True,
                     'use the native (C++) threaded batch sampler when buildable')
FLAGS.DEFINE_string('synthetic_task', 'blobs',
                    'synthetic-data task: `blobs` (fast-saturating smoke '
                    'data for e2e tests) or `hard` (non-saturating '
                    'template-classification task for the accuracy-parity '
                    'harness: the full-precision baseline lands mid-range, '
                    'so compression regressions are measurable)')
FLAGS.DEFINE_float('synthetic_snr', 0.25,
                   'hard task: per-pixel template amplitude over unit noise')
FLAGS.DEFINE_float('synthetic_label_noise', 0.1,
                   'hard task: fraction of TRAIN labels flipped uniformly '
                   '(eval labels stay clean)')


@dataclass(frozen=True)
class DatasetSpec:
    name: str
    nb_classes: int
    nb_smpls_train: int
    nb_smpls_val: int
    nb_smpls_eval: int
    batch_size: int
    batch_size_eval: int
    image_shape: Tuple[int, int, int]  # H, W, C

    def with_flag_overrides(self) -> 'DatasetSpec':
        updates = {}
        for field in ('nb_classes', 'nb_smpls_train', 'nb_smpls_val',
                      'nb_smpls_eval', 'batch_size', 'batch_size_eval'):
            value = FLAGS.get(field)
            if value is not None:
                updates[field] = int(value)
        return replace(self, **updates) if updates else self


class _Prefetcher:
    """Background-thread prefetch of host batches (reference: .prefetch())."""

    def __init__(self, gen_fn, depth: int):
        self._gen = gen_fn()
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self):
        for item in self._gen:
            self._q.put(item)

    def __iter__(self):
        return self

    def __next__(self):
        return self._q.get()


class AbstractDataset(ABC):
    """Base dataset: subclasses load (or synthesize) arrays and define augment."""

    SPEC: DatasetSpec = None  # set by subclasses

    def __init__(self, is_train: bool):
        self.is_train = is_train
        self.spec = self.SPEC.with_flag_overrides()
        # Shard across processes for multi-host DP, like the reference shards
        # the file list across Horovod ranks (abstract_dataset.py:80-81).
        self.shard_id = jax.process_index()
        self.nb_shards = jax.process_count()
        self.batch_size = self.spec.batch_size if is_train else self.spec.batch_size_eval
        self._rng = np.random.default_rng(FLAGS.rand_seed + 977 * self.shard_id
                                          + (0 if is_train else 31337))

    # -- subclass interface ---------------------------------------------------

    @abstractmethod
    def _load_arrays(self) -> Tuple[np.ndarray, np.ndarray]:
        """Return (images, labels) for this subset as host arrays.

        Images are uint8 NHWC; labels int32.  When real data files are absent
        and --synthetic_data is set, subclasses return `synthesize_arrays()`.
        """

    def augment(self, images: jax.Array, rng: jax.Array, is_train: bool) -> jax.Array:
        """On-device normalize + augment; jittable. Default: scale to [0,1]."""
        del rng, is_train
        return images.astype(np.float32) / 255.0

    def augment_batch(self, batch, rng: jax.Array, is_train: bool):
        """On-device augmentation of the WHOLE batch (images + labels).

        Classification datasets transform images only; detection datasets
        override this to keep boxes consistent with geometric transforms
        (e.g. horizontal flips mirror box coordinates)."""
        return {**batch, 'image': self.augment(batch['image'], rng, is_train)}

    def augment_xy(self, batch, rng: jax.Array, is_train: bool):
        """Augment a raw iterator batch and return ``(images, labels)``.

        The single entry point custom learner steps must use: augment_batch
        may unpack packed per-sample metadata (e.g. ILSVRC full-frame valid
        extents riding in [n, 3] float label rows) — consuming
        ``batch['label']`` raw would feed the packed row into the loss."""
        out = self.augment_batch(batch, rng, is_train)
        return out['image'], out['label']

    def augment_images(self, batch, rng: jax.Array, is_train: bool) -> jax.Array:
        """Augmented images of a raw iterator batch (labels consumed for any
        packed crop extents, then dropped) — for regression / calibration /
        feature-capture steps that only need extent-correct pixels."""
        return self.augment_batch(batch, rng, is_train)['image']

    def peek_images(self, n: int = 2) -> np.ndarray:
        """First ``n`` raw images WITHOUT building the iterator pipeline.

        build() spawns prefetch threads / a native sampler that live for the
        process — shape/dtype peeks for model init must not leak one per
        learner construction (the recurring iterator-leak defect pattern)."""
        if not hasattr(self, '_cached_arrays'):
            self._cached_arrays = self._load_arrays()
        images = self._cached_arrays[0]
        idx = np.arange(min(n, len(images)), dtype=np.int64)
        return np.asarray(images[idx])

    def peek_batch(self, n: int = 2):
        """First ``n`` raw rows as a batch dict, WITHOUT building the
        iterator pipeline — like peek_images but keeping the labels (packed
        full-frame rows carry crop extents that augment_batch needs)."""
        if not hasattr(self, '_cached_arrays'):
            self._cached_arrays = self._load_arrays()
        images, labels = self._cached_arrays
        idx = np.arange(min(n, len(images)), dtype=np.int64)
        return {'image': np.asarray(images[idx]),
                'label': np.asarray(labels[idx])}

    # -- synthetic fallback ---------------------------------------------------

    def synthesize_arrays(self, nb_smpls: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        """Deterministic learnable synthetic data: per-class Gaussian blobs.

        Class-dependent low-frequency patterns let tiny models reach high
        accuracy within a few hundred steps, which the test-suite uses the way
        the reference uses FMNIST smoke runs (docs/docs/test_cases.md).

        With --synthetic_task=hard, delegates to the non-saturating parity
        task instead (see synthesize_arrays_hard).
        """
        if FLAGS.get('synthetic_task') == 'hard':
            return self.synthesize_arrays_hard(nb_smpls)
        spec = self.spec
        n = nb_smpls or (spec.nb_smpls_train if self.is_train else spec.nb_smpls_eval)
        h, w, c = spec.image_shape
        # bound host memory: cap the synthetic set by a total-pixel budget
        n = max(64, min(n, 8192, (1 << 28) // (h * w * c)))
        rng = np.random.default_rng(12345 + (0 if self.is_train else 1))
        labels = rng.integers(0, spec.nb_classes, size=(n,), dtype=np.int32)
        # class-dependent sinusoid pattern (vectorized, float32)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        fx = (labels % 4 + 1).astype(np.float32)[:, None, None]
        fy = (labels // 4 % 4 + 1).astype(np.float32)[:, None, None]
        base = 127.5 + 80.0 * np.sin(
            2 * np.pi * (fx * xx[None] / w + fy * yy[None] / h), dtype=np.float32)
        noise = rng.standard_normal(size=(n, h, w, 1), dtype=np.float32) * 16.0
        images = base[..., None] + noise  # broadcast over channels
        images = np.broadcast_to(images, (n, h, w, c))
        return np.clip(images, 0, 255).astype(np.uint8), labels

    def synthesize_arrays_hard(self, nb_smpls: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        """Non-saturating parity task: noisy template classification.

        Each class k has a fixed smooth random template T_k (low-res Gaussian,
        bilinearly upsampled, zero-mean unit-RMS); a sample with label k is
        ``snr * T_k + N(0,1)`` per pixel.  The matched-filter (Bayes) accuracy
        is a smooth function of ``snr`` and the class count, so — unlike the
        saturating blobs task — model degradation moves eval accuracy
        SMOOTHLY: a capacity-limited net lands mid-range and any compression
        bug (wrong quant levels, broken masks, mis-selected channels) shows
        up as a measurable accuracy delta.  Train labels are flipped with
        probability --synthetic_label_noise (eval labels stay clean), bounding
        train-set memorization.  Templates are shared between train and eval
        (fixed seed); sample noise is held out per subset.
        """
        spec = self.spec
        n = nb_smpls or (spec.nb_smpls_train if self.is_train else spec.nb_smpls_eval)
        h, w, c = spec.image_shape
        n = max(64, min(n, 16384, (1 << 28) // (h * w * c)))
        snr = float(FLAGS.get('synthetic_snr') or 0.25)
        label_noise = float(FLAGS.get('synthetic_label_noise') or 0.0)
        nb_classes = spec.nb_classes

        # class templates: fixed seed, shared across subsets/processes
        trng = np.random.default_rng(777)
        lo = max(4, h // 4), max(4, w // 4)
        tmpl_lo = trng.standard_normal((nb_classes, lo[0], lo[1], c)).astype(np.float32)
        # bilinear upsample via separable linear interpolation
        yi = np.linspace(0, lo[0] - 1, h)
        xi = np.linspace(0, lo[1] - 1, w)
        y0 = np.clip(yi.astype(int), 0, lo[0] - 2)
        x0 = np.clip(xi.astype(int), 0, lo[1] - 2)
        wy = (yi - y0)[None, :, None, None].astype(np.float32)
        wx = (xi - x0)[None, None, :, None].astype(np.float32)
        t = (tmpl_lo[:, y0][:, :, x0] * (1 - wy) * (1 - wx)
             + tmpl_lo[:, y0 + 1][:, :, x0] * wy * (1 - wx)
             + tmpl_lo[:, y0][:, :, x0 + 1] * (1 - wy) * wx
             + tmpl_lo[:, y0 + 1][:, :, x0 + 1] * wy * wx)
        t -= t.mean(axis=(1, 2, 3), keepdims=True)
        t /= np.sqrt((t ** 2).mean(axis=(1, 2, 3), keepdims=True)) + 1e-8

        srng = np.random.default_rng(24601 + (0 if self.is_train else 1))
        labels_clean = srng.integers(0, nb_classes, size=(n,), dtype=np.int32)
        images = snr * t[labels_clean]
        # generate noise in chunks to bound peak host memory
        for beg in range(0, n, 1024):
            end = min(n, beg + 1024)
            images[beg:end] += srng.standard_normal(
                (end - beg, h, w, c), dtype=np.float32)
        labels = labels_clean
        if self.is_train and label_noise > 0.0:
            flip = srng.random(n) < label_noise
            shift = srng.integers(1, nb_classes, size=(n,), dtype=np.int32)
            labels = np.where(flip, (labels_clean + shift) % nb_classes,
                              labels_clean).astype(np.int32)
        # map to uint8: 1 sigma of noise = 40 counts (3 sigma mostly unclipped)
        images = np.clip(127.5 + 40.0 * images, 0, 255).astype(np.uint8)
        return images, labels

    # -- pipeline -------------------------------------------------------------

    def build(self, enbl_trn_val_split: bool = False):
        """Build batch iterator(s); mirrors AbstractDataset.build (:55-94).

        Returns one iterator, or (train_iter, val_iter) when splitting.
        Iterators yield dict batches {'image': uint8 [B,H,W,C], 'label': int32 [B]}.
        """
        if not hasattr(self, '_cached_arrays'):
            self._cached_arrays = self._load_arrays()
        images, labels = self._cached_arrays
        self.nb_smpls_loaded = len(images)
        # Shard by process (multi-host) — train AND eval: put_batch assembles
        # the global batch from process-local data, so every process must hold
        # a DISJOINT shard or the global eval batch would contain P copies of
        # the same samples (reference shards per rank for both subsets,
        # abstract_dataset.py:80-81).
        if self.nb_shards > 1:
            images = images[self.shard_id::self.nb_shards]
            labels = labels[self.shard_id::self.nb_shards]
        if enbl_trn_val_split:
            nb_val = min(self.spec.nb_smpls_val, len(images) // 5)
            val = self._make_iterator(images[:nb_val], labels[:nb_val], shuffle=False)
            trn = self._make_iterator(images[nb_val:], labels[nb_val:], shuffle=self.is_train)
            return trn, val
        return self._make_iterator(images, labels, shuffle=self.is_train)

    def _make_iterator(self, images: np.ndarray, labels: np.ndarray,
                       shuffle: bool) -> Iterator[Dict[str, np.ndarray]]:
        batch_size = self.batch_size
        rng = self._rng
        if FLAGS.get('enbl_native_loader', True):
            # native threaded sampler (libpfdata, the tf.data-runtime analogue)
            try:
                from pocketflow_tpu.datasets.native_loader import NativeSampler
                return NativeSampler(
                    images, labels, batch_size, shuffle,
                    seed=FLAGS.rand_seed + 977 * self.shard_id,
                    nb_threads=max(1, min(4, FLAGS.nb_threads // 2)),
                    queue_depth=max(2, FLAGS.prefetch_size))
            except (RuntimeError, OSError):
                pass  # toolchain unavailable: NumPy fallback below

        def gen():
            n = len(images)
            order = np.arange(n)
            if shuffle:
                rng.shuffle(order)  # the FIRST epoch must be shuffled too
                if n < batch_size:
                    # tiny process shard: tile so the jitted step's fixed
                    # batch shape holds (short RL finetunes on split
                    # datasets hit this) — training only; eval iterators
                    # cycle seamlessly below so no sample is head-biased
                    order = np.resize(order, batch_size)
                    n = batch_size
                pos = 0
                while True:
                    if pos + batch_size > n:
                        pos = 0
                        rng.shuffle(order)
                    idx = order[pos:pos + batch_size]
                    pos += batch_size
                    yield {'image': images[idx], 'label': labels[idx]}
            else:
                # eval: cycle the sequence SEAMLESSLY (batches wrap through
                # the set, same contract as the native sampler's non-shuffle
                # path) so run_eval_loop can pick a batch count that covers
                # every sample an equal number of times — no dropped tail,
                # no duplicated head
                pos = 0
                while True:
                    idx = np.take(order, np.arange(pos, pos + batch_size),
                                  mode='wrap')
                    pos = (pos + batch_size) % n
                    yield {'image': images[idx], 'label': labels[idx]}

        return _Prefetcher(gen, depth=max(2, FLAGS.prefetch_size))

