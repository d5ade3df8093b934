"""Fashion-MNIST dataset (rebuild of /root/reference/examples/fmnist_dataset.py:90-165).

Reference loads idx-format gz files into memory and uses from_tensor_slices;
here the same in-memory approach with the idx parser, falling back to
deterministic synthetic data when files are absent (--synthetic_data).
"""

from __future__ import annotations

import gzip
import os
from typing import Tuple

import numpy as np

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.datasets.abstract import AbstractDataset, DatasetSpec


def _load_idx_images(path: str) -> np.ndarray:
    with gzip.open(path, 'rb') as fin:
        data = fin.read()
    n = int.from_bytes(data[4:8], 'big')
    rows = int.from_bytes(data[8:12], 'big')
    cols = int.from_bytes(data[12:16], 'big')
    return np.frombuffer(data, np.uint8, offset=16).reshape(n, rows, cols, 1)


def _load_idx_labels(path: str) -> np.ndarray:
    with gzip.open(path, 'rb') as fin:
        data = fin.read()
    return np.frombuffer(data, np.uint8, offset=8).astype(np.int32)


class FMnistDataset(AbstractDataset):
    SPEC = DatasetSpec(
        name='fmnist', nb_classes=10,
        nb_smpls_train=60000, nb_smpls_val=5000, nb_smpls_eval=10000,
        batch_size=128, batch_size_eval=100, image_shape=(28, 28, 1))

    def _load_arrays(self) -> Tuple[np.ndarray, np.ndarray]:
        from pocketflow_tpu.datasets.remote_fs import resolve_data_dir
        data_dir = resolve_data_dir()
        prefix = 'train' if self.is_train else 't10k'
        if data_dir:
            img_path = os.path.join(data_dir, '%s-images-idx3-ubyte.gz' % prefix)
            lbl_path = os.path.join(data_dir, '%s-labels-idx1-ubyte.gz' % prefix)
            if os.path.exists(img_path) and os.path.exists(lbl_path):
                return _load_idx_images(img_path), _load_idx_labels(lbl_path)
        return self.synthesize_arrays()

    def augment(self, images, rng, is_train):
        del rng, is_train
        # Reference normalizes by fixed mean/std of 0.5 domain; scale to [0,1).
        return images.astype(np.float32) / 255.0
