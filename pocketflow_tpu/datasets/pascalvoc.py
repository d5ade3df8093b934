"""Pascal VOC detection dataset.

Rebuild of /root/reference/datasets/pascalvoc_dataset.py:39-197.  The
reference parses TFRecords with bbox/difficult/truncated features and packs
annotations into a fixed [nb_bboxs_max, 8] tensor per image; here labels are
a fixed [nb_bboxs_max, 6] float array per image:

    [class_id, ymin, xmin, ymax, xmax, valid]     (coords normalized to [0,1])

Real data: a directory of .npz shards with 'images' (uint8 NHWC) and 'boxes'
(list of [n_i, 5] arrays).  Synthetic fallback: class-colored rectangles on a
noise background — tiny detectors can overfit it within a few hundred steps,
giving the test-suite a CPU-runnable detection config (the reference's
test_cases.md uses full VOC training runs as its gate).
"""

from __future__ import annotations

import glob
import os
from typing import Tuple

import numpy as np

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.datasets.abstract import AbstractDataset, DatasetSpec

FLAGS.DEFINE_integer('nb_bboxs_max', 32, 'max # of bounding boxes per image')
FLAGS.DEFINE_integer('voc_image_size', None,
                     'override Pascal VOC image size (e.g. 64 for smoke tests)')
# synthetic-task difficulty knobs (defaults = the exact regime the committed
# SSD detection bands were measured in; harder strips lower amp / raise noise
# / shrink boxes to pull the achievable-mAP ceiling below saturation)
FLAGS.DEFINE_float('synthetic_det_noise', 0.0,
                   'additive gaussian pixel-noise sigma (uint8 units) on '
                   'synthetic detection images')
FLAGS.DEFINE_float('synthetic_det_amp', 120.0,
                   'texture amplitude of synthetic detection objects')
FLAGS.DEFINE_integer('synthetic_det_min_div', 4,
                     'min object size = image_size // this')
FLAGS.DEFINE_integer('synthetic_det_max_div', 2,
                     'max object size = image_size // this')

VOC_CLASSES = (
    'aeroplane', 'bicycle', 'bird', 'boat', 'bottle', 'bus', 'car', 'cat',
    'chair', 'cow', 'diningtable', 'dog', 'horse', 'motorbike', 'person',
    'pottedplant', 'sheep', 'sofa', 'train', 'tvmonitor')


class PascalVocDataset(AbstractDataset):
    SPEC = DatasetSpec(
        name='pascalvoc', nb_classes=21,  # 20 classes + background(0)
        nb_smpls_train=22136, nb_smpls_val=2000, nb_smpls_eval=4952,
        batch_size=32, batch_size_eval=32, image_shape=(300, 300, 3))

    def __init__(self, is_train: bool):
        super().__init__(is_train)
        size = FLAGS.get('voc_image_size')
        if size:
            from dataclasses import replace
            self.spec = replace(self.spec, image_shape=(int(size), int(size), 3))

    def _load_arrays(self) -> Tuple[np.ndarray, np.ndarray]:
        from pocketflow_tpu.datasets.remote_fs import resolve_data_dir
        data_dir = resolve_data_dir()
        if data_dir and os.path.isdir(data_dir):
            pattern = 'train*.npz' if self.is_train else 'val*.npz'
            paths = sorted(glob.glob(os.path.join(data_dir, pattern)))
            if paths:
                return self._parse_npz(paths)
        return self.synthesize_detection_arrays()

    def _parse_npz(self, paths):
        images, labels = [], []
        nb_max = FLAGS.nb_bboxs_max
        for path in paths:
            blob = np.load(path, allow_pickle=True)
            images.append(blob['images'])
            difficult = blob['difficult'] if 'difficult' in blob.files else None
            for idx, boxes in enumerate(blob['boxes']):
                padded = np.zeros((nb_max, 6), np.float32)
                n = min(len(boxes), nb_max)
                padded[:n, :5] = boxes[:n]
                padded[:n, 5] = 1.0
                if difficult is not None and len(difficult[idx]):
                    # VOC protocol: 'difficult' ground truth is never matched
                    # in training (negative validity kills its IoU) and is
                    # IGNORED (neither tp nor fp) by the mAP evaluator
                    diff = difficult[idx][:n].astype(bool)
                    padded[:n, 5] = np.where(diff, -1.0, 1.0)
                labels.append(padded)
        return np.concatenate(images), np.stack(labels)

    def synthesize_detection_arrays(self, nb_smpls=None):
        """Rectangles whose texture frequency encodes the class."""
        spec = self.spec
        n = nb_smpls or (spec.nb_smpls_train if self.is_train else spec.nb_smpls_eval)
        h, w, c = spec.image_shape
        # bound host memory by total pixels (~128 MiB of uint8), not a fixed
        # sample count: small-resolution parity strips legitimately ask for
        # 8k+ images to put the task in a generalizing (non-memorizable) regime
        n = max(64, min(n, (1 << 27) // (h * w * c)))
        nb_max = FLAGS.nb_bboxs_max
        def _flag(name, default):
            # an explicit 0/0.0 is a valid setting (e.g. texture-free probes
            # with synthetic_det_amp=0), so only None falls back (ADVICE r4)
            value = FLAGS.get(name)
            return default if value is None else value
        amp = float(_flag('synthetic_det_amp', 120.0))
        noise = float(_flag('synthetic_det_noise', 0.0))
        min_div = int(_flag('synthetic_det_min_div', 4))
        max_div = int(_flag('synthetic_det_max_div', 2))
        rng = np.random.default_rng(777 + (0 if self.is_train else 1))
        images = rng.integers(100, 156, size=(n, h, w, c)).astype(np.uint8)
        labels = np.zeros((n, nb_max, 6), np.float32)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        for i in range(n):
            nb_boxes = rng.integers(1, 4)
            placed = []
            for b in range(nb_boxes):
                cls = int(rng.integers(1, spec.nb_classes))
                # rejection-sample a box that doesn't intersect earlier ones:
                # a later box would PAINT OVER an earlier box's texture,
                # leaving a ground-truth label whose visual evidence is gone
                # (irreducible label noise that caps achievable mAP)
                for _ in range(8):
                    bh = rng.integers(max(h // min_div, 2), max(h // max_div, 3))
                    bw = rng.integers(max(w // min_div, 2), max(w // max_div, 3))
                    y0 = rng.integers(0, h - bh)
                    x0 = rng.integers(0, w - bw)
                    if all(y0 >= py1 or y0 + bh <= py0 or
                           x0 >= px1 or x0 + bw <= px0
                           for py0, px0, py1, px1 in placed):
                        break
                else:
                    continue  # image stays at nb_boxes-1 ground truths
                placed.append((y0, x0, y0 + bh, x0 + bw))
                fx, fy = (cls % 5) + 1, (cls // 5) + 1
                patch = 127.5 + amp * np.sin(
                    2 * np.pi * (fx * xx[y0:y0 + bh, x0:x0 + bw] / w
                                 + fy * yy[y0:y0 + bh, x0:x0 + bw] / h))
                images[i, y0:y0 + bh, x0:x0 + bw] = np.clip(
                    patch[..., None], 0, 255).astype(np.uint8)
                labels[i, len(placed) - 1] = [cls, y0 / h, x0 / w,
                                              (y0 + bh) / h, (x0 + bw) / w,
                                              1.0]
        if noise > 0.0:
            images = np.clip(
                images.astype(np.float32)
                + rng.normal(0.0, noise, size=images.shape).astype(np.float32),
                0, 255).astype(np.uint8)
        return images, labels

    def augment(self, images, rng, is_train):
        import jax.numpy as jnp
        images = images.astype(jnp.float32)
        mean = jnp.asarray([123.0, 117.0, 104.0][:images.shape[-1]])
        return images - mean

    def augment_batch(self, batch, rng, is_train):
        """SSD-style on-device train augmentation with box-consistent
        geometry: per-image horizontal flip (boxes mirrored) + photometric
        jitter (brightness/contrast), then VGG mean-subtract.  The reference
        runs its SSD preprocessing (color distort + crop) on host CPUs inside
        tf.data (utils/external/ssd_tensorflow/preprocessing); here it rides
        the VPU inside the jitted step."""
        import jax
        import jax.numpy as jnp
        images = batch['image'].astype(jnp.float32)
        labels = batch['label'].astype(jnp.float32)
        if is_train:
            k_flip, k_bri, k_con = jax.random.split(rng, 3)
            b = images.shape[0]
            flip = jax.random.bernoulli(k_flip, 0.5, (b,))
            flipped = images[:, :, ::-1, :]
            images = jnp.where(flip[:, None, None, None], flipped, images)
            # mirror xmin/xmax: x' = 1 - x (swap the pair)
            xmin, xmax = labels[..., 2], labels[..., 4]
            new_xmin = jnp.where(flip[:, None], 1.0 - xmax, xmin)
            new_xmax = jnp.where(flip[:, None], 1.0 - xmin, xmax)
            labels = labels.at[..., 2].set(new_xmin).at[..., 4].set(new_xmax)
            # photometric jitter (valid-only; zero-padded boxes unaffected)
            brightness = jax.random.uniform(k_bri, (b, 1, 1, 1), minval=-16.0,
                                            maxval=16.0)
            contrast = jax.random.uniform(k_con, (b, 1, 1, 1), minval=0.8,
                                          maxval=1.2)
            mean_pix = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
            images = (images - mean_pix) * contrast + mean_pix + brightness
            images = jnp.clip(images, 0.0, 255.0)
        mean = jnp.asarray([123.0, 117.0, 104.0][:images.shape[-1]])
        return {**batch, 'image': images - mean, 'label': labels}
