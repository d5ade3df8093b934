"""CIFAR-10 dataset (rebuild of /root/reference/datasets/cifar10_dataset.py:43-104).

Reference reads fixed-length-record .bin files, normalizes by dataset
mean/std, and augments with pad-crop-flip in tf.data map.  Here the .bin
parsing happens once on the host into arrays; mean/std normalization and
pad-crop-flip run on device (datasets/augment.py), keeping the transfer uint8.
"""

from __future__ import annotations

import glob
import os
from typing import Tuple

import numpy as np

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.datasets import augment
from pocketflow_tpu.datasets.abstract import AbstractDataset, DatasetSpec

# Per-channel mean/std used by the reference (cifar10_dataset.py IMAGE_* consts).
CIFAR10_MEAN = (125.3, 123.0, 113.9)
CIFAR10_STD = (63.0, 62.1, 66.7)

_RECORD_BYTES = 1 + 32 * 32 * 3


def _parse_bin_files(paths) -> Tuple[np.ndarray, np.ndarray]:
    raw = np.concatenate([np.fromfile(path, np.uint8) for path in paths])
    # native threaded parse (libpfdata) when buildable, NumPy otherwise
    from pocketflow_tpu.datasets.native_loader import parse_cifar10
    parsed = parse_cifar10(raw)
    if parsed is not None:
        return parsed
    recs = raw.reshape(-1, _RECORD_BYTES)
    labels = recs[:, 0].astype(np.int32)
    images = recs[:, 1:].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return np.ascontiguousarray(images), labels


class Cifar10Dataset(AbstractDataset):
    SPEC = DatasetSpec(
        name='cifar_10', nb_classes=10,
        nb_smpls_train=50000, nb_smpls_val=5000, nb_smpls_eval=10000,
        batch_size=128, batch_size_eval=100, image_shape=(32, 32, 3))

    def _load_arrays(self) -> Tuple[np.ndarray, np.ndarray]:
        from pocketflow_tpu.datasets.remote_fs import resolve_data_dir
        data_dir = resolve_data_dir()
        if data_dir and os.path.isdir(data_dir):
            pattern = 'data_batch_*.bin' if self.is_train else 'test_batch.bin'
            paths = sorted(glob.glob(os.path.join(data_dir, '**', pattern), recursive=True))
            if paths:
                return _parse_bin_files(paths)
        return self.synthesize_arrays()

    def augment(self, images, rng, is_train):
        images = augment.normalize(images, CIFAR10_MEAN, CIFAR10_STD)
        if is_train:
            import jax
            k_crop, k_flip = jax.random.split(rng)
            images = augment.pad_random_crop(images, k_crop, pad=4)
            images = augment.random_flip_lr(images, k_flip)
        return images
