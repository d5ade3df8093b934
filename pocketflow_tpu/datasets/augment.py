"""On-device image augmentation ops (jittable, batched, VPU-friendly).

Replaces the reference's host-side tf.data map functions:
* CIFAR-10 pad-crop-flip + per-image standardization
  (/root/reference/datasets/cifar10_dataset.py:43-76),
* ILSVRC-12 Inception-style crop/resize/flip
  (/root/reference/datasets/ilsvrc12_dataset.py + utils/external imagenet preproc).

All ops are batched and fixed-shape: random crops are realized as a batched
dynamic-slice driven by per-sample offsets (gather of a rolled window), which
XLA lowers onto the VPU without host round-trips.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def normalize(images: jax.Array, mean: Sequence[float], std: Sequence[float]) -> jax.Array:
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (images.astype(jnp.float32) - mean) / std


def random_flip_lr(images: jax.Array, rng: jax.Array) -> jax.Array:
    """Per-sample horizontal flip; images [B,H,W,C]."""
    flip = jax.random.bernoulli(rng, 0.5, (images.shape[0],))
    flipped = images[:, :, ::-1, :]
    return jnp.where(flip[:, None, None, None], flipped, images)


def pad_random_crop(images: jax.Array, rng: jax.Array, pad: int = 4) -> jax.Array:
    """Pad by `pad` on each side then randomly crop back to the original size.

    Fixed-shape implementation: pad, then per-sample dynamic_slice via vmap.
    """
    batch, height, width, chans = images.shape
    padded = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode='constant')
    ry, rx = jax.random.randint(rng, (2, batch), 0, 2 * pad + 1)

    def crop_one(img, offy, offx):
        return jax.lax.dynamic_slice(img, (offy, offx, 0), (height, width, chans))

    return jax.vmap(crop_one)(padded, ry, rx)


def random_crop_resize(images: jax.Array, rng: jax.Array,
                       out_size: Tuple[int, int],
                       area_range: Tuple[float, float] = (0.08, 1.0)) -> jax.Array:
    """Inception-style random-area crop + bilinear resize (train preproc).

    Simplified fixed-shape variant of the reference's bbox-aware sampled
    distorted crop: sample a scale factor, crop a square region, resize.
    """
    batch, height, width, _ = images.shape
    k_scale, k_off = jax.random.split(rng)
    area = jax.random.uniform(rng, (batch,), minval=area_range[0], maxval=area_range[1])
    side_frac = jnp.sqrt(area)
    max_side = min(height, width)
    sides = jnp.maximum((side_frac * max_side).astype(jnp.int32), 8)
    offy = (jax.random.uniform(k_off, (batch,)) * (height - sides)).astype(jnp.int32)
    offx = (jax.random.uniform(k_scale, (batch,)) * (width - sides)).astype(jnp.int32)

    def crop_resize_one(img, oy, ox, side):
        # Fixed-size gather grid: sample out_size points from the crop window.
        ys = oy + (jnp.arange(out_size[0]) * side) // out_size[0]
        xs = ox + (jnp.arange(out_size[1]) * side) // out_size[1]
        return img[ys][:, xs]

    return jax.vmap(crop_resize_one)(images, offy, offx, sides).astype(images.dtype)


def center_crop_resize(images: jax.Array, out_size: Tuple[int, int],
                       crop_frac: float = 0.875) -> jax.Array:
    """Eval preproc: central crop (fraction) + nearest resize."""
    _, height, width, _ = images.shape
    side = int(min(height, width) * crop_frac)
    offy, offx = (height - side) // 2, (width - side) // 2
    ys = offy + (jnp.arange(out_size[0]) * side) // out_size[0]
    xs = offx + (jnp.arange(out_size[1]) * side) // out_size[1]
    return images[:, ys][:, :, xs]


def per_image_standardize(images: jax.Array) -> jax.Array:
    """tf.image.per_image_standardization equivalent (batched)."""
    images = images.astype(jnp.float32)
    mean = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
    std = jnp.std(images, axis=(1, 2, 3), keepdims=True)
    nb_elems = jnp.asarray(images.shape[1] * images.shape[2] * images.shape[3], jnp.float32)
    adj_std = jnp.maximum(std, 1.0 / jnp.sqrt(nb_elems))
    return (images - mean) / adj_std
