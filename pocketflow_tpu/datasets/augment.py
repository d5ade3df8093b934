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


def _bilinear_sample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Bilinear gather of img [H,W,C] at float row coords ys and col coords xs."""
    H, W = img.shape[:2]
    y0 = jnp.clip(jnp.floor(ys), 0, H - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 2).astype(jnp.int32)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[None, :, None]
    f = img.astype(jnp.float32)
    f00 = f[y0][:, x0]
    f01 = f[y0][:, x0 + 1]
    f10 = f[y0 + 1][:, x0]
    f11 = f[y0 + 1][:, x0 + 1]
    return (f00 * (1 - wy) * (1 - wx) + f01 * (1 - wy) * wx
            + f10 * wy * (1 - wx) + f11 * wy * wx)


def random_crop_resize(images: jax.Array, rng: jax.Array,
                       out_size: Tuple[int, int],
                       area_range: Tuple[float, float] = (0.08, 1.0),
                       aspect_range: Tuple[float, float] = (3 / 4, 4 / 3),
                       valid_hw: jax.Array = None) -> jax.Array:
    """Inception-style random area + ASPECT-RATIO distorted crop, bilinear
    resize (train preproc; reference `sample_distorted_bounding_box` with
    aspect_ratio_range=(0.75, 1.33), area_range=(0.08, 1.0) in
    utils/external's imagenet preprocessing).

    Fixed-shape redesign: per-sample (area, log-uniform aspect) -> rectangular
    crop window clamped inside the VALID image extent, realized as a bilinear
    gather grid.  ``valid_hw`` [B, 2] float (valid height, valid width) comes
    from the full-frame shard storage (tools/convert_ilsvrc12.py): windows
    then range over the ENTIRE original frame — the same reachable crop space
    as the reference's Inception sampler.  Without it, the whole stored
    array is the frame.
    """
    batch, height, width, _ = images.shape
    k_area, k_aspect, k_oy, k_ox = jax.random.split(rng, 4)
    if valid_hw is None:
        vh = jnp.full((batch,), float(height), jnp.float32)
        vw = jnp.full((batch,), float(width), jnp.float32)
    else:
        vh = jnp.clip(valid_hw[:, 0].astype(jnp.float32), 2.0, float(height))
        vw = jnp.clip(valid_hw[:, 1].astype(jnp.float32), 2.0, float(width))
    area = jax.random.uniform(k_area, (batch,), minval=area_range[0],
                              maxval=area_range[1])
    log_ar = jax.random.uniform(
        k_aspect, (batch,), minval=jnp.log(aspect_range[0]),
        maxval=jnp.log(aspect_range[1]))
    aspect = jnp.exp(log_ar)   # w / h
    # crop box in pixels, clamped to the valid frame
    crop_h = jnp.sqrt(area * vh * vw / aspect)
    crop_w = crop_h * aspect
    crop_h = jnp.clip(crop_h, 8.0, vh)
    crop_w = jnp.clip(crop_w, 8.0, vw)
    offy = jax.random.uniform(k_oy, (batch,)) * (vh - crop_h)
    offx = jax.random.uniform(k_ox, (batch,)) * (vw - crop_w)

    ry = jnp.arange(out_size[0], dtype=jnp.float32) / out_size[0]
    rx = jnp.arange(out_size[1], dtype=jnp.float32) / out_size[1]

    def crop_resize_one(img, oy, ox, ch, cw):
        # sample strictly inside [oy, oy+ch-1]: the gather never blends
        # zero-padding beyond a sample's valid extent
        ys = oy + ry * jnp.maximum(ch - 1.0, 1.0)
        xs = ox + rx * jnp.maximum(cw - 1.0, 1.0)
        return _bilinear_sample(img, ys, xs)

    out = jax.vmap(crop_resize_one)(images, offy, offx, crop_h, crop_w)
    return out.astype(images.dtype) if images.dtype != jnp.uint8 \
        else jnp.clip(out, 0, 255).astype(jnp.uint8)


def center_crop_resize(images: jax.Array, out_size: Tuple[int, int],
                       crop_frac: float = 0.875,
                       valid_hw: jax.Array = None) -> jax.Array:
    """Eval preproc: central crop (fraction) + bilinear resize (reference's
    87.5% central_fraction eval path).  ``valid_hw`` [B, 2] restricts the
    central crop to each sample's valid extent (full-frame shard storage)."""
    batch, height, width, _ = images.shape
    ry = jnp.arange(out_size[0], dtype=jnp.float32) / out_size[0]
    rx = jnp.arange(out_size[1], dtype=jnp.float32) / out_size[1]
    if valid_hw is None:
        side = min(height, width) * crop_frac
        offy, offx = (height - side) / 2.0, (width - side) / 2.0
        ys = offy + ry * side
        xs = offx + rx * side
        out = jax.vmap(lambda img: _bilinear_sample(img, ys, xs))(images)
    else:
        vh = jnp.clip(valid_hw[:, 0].astype(jnp.float32), 2.0, float(height))
        vw = jnp.clip(valid_hw[:, 1].astype(jnp.float32), 2.0, float(width))
        side = jnp.minimum(vh, vw) * crop_frac
        offy, offx = (vh - side) / 2.0, (vw - side) / 2.0

        def crop_one(img, oy, ox, s):
            ys = oy + ry * jnp.maximum(s - 1.0, 1.0)
            xs = ox + rx * jnp.maximum(s - 1.0, 1.0)
            return _bilinear_sample(img, ys, xs)

        out = jax.vmap(crop_one)(images, offy, offx, side)
    return out.astype(images.dtype) if images.dtype != jnp.uint8 \
        else jnp.clip(out, 0, 255).astype(jnp.uint8)


def per_image_standardize(images: jax.Array) -> jax.Array:
    """tf.image.per_image_standardization equivalent (batched)."""
    images = images.astype(jnp.float32)
    mean = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
    std = jnp.std(images, axis=(1, 2, 3), keepdims=True)
    nb_elems = jnp.asarray(images.shape[1] * images.shape[2] * images.shape[3], jnp.float32)
    adj_std = jnp.maximum(std, 1.0 / jnp.sqrt(nb_elems))
    return (images - mean) / adj_std
