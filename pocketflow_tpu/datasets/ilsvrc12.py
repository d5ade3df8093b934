"""ILSVRC-12 (ImageNet) dataset (rebuild of /root/reference/datasets/ilsvrc12_dataset.py:39-127).

The reference consumes TFRecords with Inception-style bbox-aware preprocessing.
This rebuild reads a directory of pre-decoded `.npy` shards (created by the
companion `tools/convert_ilsvrc12.py` converter from TFRecord/ImageFolder data)
or falls back to deterministic synthetic data at 224x224 for benchmarks/tests.

Train preproc = random-area crop + resize + flip; eval = 87.5% center crop —
both on device (datasets/augment.py), matching the reference's Inception
pipeline semantics (utils/external/{preprocessing}).
"""

from __future__ import annotations

import glob
import os
from typing import Tuple

import numpy as np

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.datasets import augment
from pocketflow_tpu.datasets.abstract import AbstractDataset, DatasetSpec

IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


FLAGS.DEFINE_integer(
    'ilsvrc_image_size', None,
    'override the 224x224 ILSVRC input resolution (synthetic/benchmark runs '
    'only — e.g. the MobileNet parity strip at 96 keeps the 1-core host + '
    'tunnel cost sane; real shard files are always 224)')
FLAGS.DEFINE_string(
    'ilsvrc_augment', 'inception',
    "train-time preprocessing: 'inception' = the reference's distorted "
    "area/aspect crops; 'mild' = center crop + horizontal flip only (the "
    "synthetic parity strips use this — position-locked template tasks are "
    "destroyed by aggressive crops)")


class Ilsvrc12Dataset(AbstractDataset):
    # nb_classes = 1001 (class 0 = background) matching the reference
    SPEC = DatasetSpec(
        name='ilsvrc_12', nb_classes=1001,
        nb_smpls_train=1281167, nb_smpls_val=10000, nb_smpls_eval=50000,
        batch_size=64, batch_size_eval=100, image_shape=(224, 224, 3))

    def __init__(self, is_train: bool):
        super().__init__(is_train)
        size = FLAGS.get('ilsvrc_image_size')
        if size:
            from dataclasses import replace
            self.spec = replace(self.spec, image_shape=(int(size), int(size), 3))

    def _load_arrays(self) -> Tuple[np.ndarray, np.ndarray]:
        from pocketflow_tpu.datasets.remote_fs import resolve_data_dir
        data_dir = resolve_data_dir()
        subset = 'train' if self.is_train else 'val'
        if data_dir and os.path.isdir(data_dir):
            img_shards = sorted(glob.glob(os.path.join(data_dir, '%s_images_*.npy' % subset)))
            lbl_shards = sorted(glob.glob(os.path.join(data_dir, '%s_labels_*.npy' % subset)))
            ext_shards = sorted(glob.glob(os.path.join(data_dir, '%s_extents_*.npy' % subset)))
            if img_shards:
                # Stream rows out of the shard files — NEVER concatenate into
                # RAM (the real train set is ~190 GB).  ShardedView + the
                # native pread sampler keep resident memory bounded at the
                # prefetch queue, the rebuild's parallel_interleave
                # (reference: datasets/abstract_dataset.py:55-94).
                from pocketflow_tpu.datasets.shards import ShardedView
                images = ShardedView.from_npy_files(img_shards)
                labels = np.concatenate([np.load(p) for p in lbl_shards]).astype(np.int32)
                if len(labels) != len(images):
                    raise ValueError(
                        'ILSVRC-12 shard mismatch: %d images vs %d labels'
                        % (len(images), len(labels)))
                if ext_shards:
                    # full-frame storage: ride the per-sample valid extents
                    # along in a packed [n, 3] float label row (the native
                    # sampler streams any label_floats); augment_batch
                    # unpacks them on device
                    extents = np.concatenate(
                        [np.load(p) for p in ext_shards]).astype(np.float32)
                    if len(extents) != len(images):
                        raise ValueError('ILSVRC-12 extents mismatch')
                    labels = np.concatenate(
                        [labels[:, None].astype(np.float32), extents], axis=1)
                return images, labels
        return self.synthesize_arrays(nb_smpls=2048)

    def augment_batch(self, batch, rng, is_train):
        """Unpack [class, valid_h, valid_w] labels (full-frame shards) and
        crop within each sample's valid extent; plain labels pass through."""
        import jax.numpy as jnp
        label = batch['label']
        if label.ndim == 2 and label.shape[1] == 3:
            valid_hw = label[:, 1:3]
            images = self._augment_images(batch['image'], rng, is_train, valid_hw)
            return {**batch, 'image': images,
                    'label': label[:, 0].astype(jnp.int32)}
        return {**batch, 'image': self.augment(batch['image'], rng, is_train)}

    def augment(self, images, rng, is_train):
        return self._augment_images(images, rng, is_train, None)

    def _augment_images(self, images, rng, is_train, valid_hw):
        out_hw = self.spec.image_shape[:2]
        if is_train:
            import jax
            k_crop, k_flip = jax.random.split(rng)
            if FLAGS.get('ilsvrc_augment') == 'mild':
                if images.shape[1:3] != tuple(out_hw) or valid_hw is not None:
                    images = augment.center_crop_resize(images, out_hw,
                                                        valid_hw=valid_hw)
            elif images.shape[1:3] != tuple(out_hw) or valid_hw is not None:
                images = augment.random_crop_resize(images, k_crop, out_hw,
                                                    valid_hw=valid_hw)
            images = augment.random_flip_lr(images, k_flip)
        else:
            if images.shape[1:3] != tuple(out_hw) or valid_hw is not None:
                images = augment.center_crop_resize(images, out_hw,
                                                    valid_hw=valid_hw)
        return augment.normalize(images, IMAGENET_MEAN, IMAGENET_STD)
