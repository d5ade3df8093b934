"""SSD anchor generation, IoU matching, box encode/decode — all jittable.

Rebuild of the anchor machinery the reference vendors in
/root/reference/utils/external/ssd_tensorflow/utility/anchor_manipulator.py
(wrapped by nets/vgg_at_pascalvoc.py:84-217).  Anchors are static numpy at
model-build time; matching/encoding run inside the jitted train step (the
reference does matching in the tf.data map function on CPU — moving it on
device removes the host bottleneck and keeps the uint8 transfer).
"""

from __future__ import annotations

import itertools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def generate_anchors(feature_sizes: Sequence[int],
                     scales: Sequence[float],
                     aspect_ratios: Sequence[Sequence[float]]) -> np.ndarray:
    """Anchor boxes [A, 4] as (ymin, xmin, ymax, xmax), normalized to [0,1]
    (purely fractional — independent of the pixel resolution).

    scales has len(feature_sizes)+1 entries (the extra one forms the
    sqrt(s_k * s_{k+1}) anchor, standard SSD).
    """
    anchors = []
    for idx, fsize in enumerate(feature_sizes):
        s_k = scales[idx]
        s_k1 = scales[idx + 1] if idx + 1 < len(scales) else 1.0
        sizes = [(s_k, s_k)]
        sizes.append((math.sqrt(s_k * s_k1), math.sqrt(s_k * s_k1)))
        for ar in aspect_ratios[idx]:
            sizes.append((s_k / math.sqrt(ar), s_k * math.sqrt(ar)))
        for y, x in itertools.product(range(fsize), repeat=2):
            cy, cx = (y + 0.5) / fsize, (x + 0.5) / fsize
            for sh, sw in sizes:
                anchors.append([cy - sh / 2, cx - sw / 2,
                                cy + sh / 2, cx + sw / 2])
    return np.clip(np.asarray(anchors, np.float32), 0.0, 1.0)


def iou_matrix(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Pairwise IoU: boxes_a [N,4] x boxes_b [M,4] -> [N,M]."""
    a = boxes_a[:, None, :]
    b = boxes_b[None, :, :]
    inter_ymin = jnp.maximum(a[..., 0], b[..., 0])
    inter_xmin = jnp.maximum(a[..., 1], b[..., 1])
    inter_ymax = jnp.minimum(a[..., 2], b[..., 2])
    inter_xmax = jnp.minimum(a[..., 3], b[..., 3])
    inter = (jnp.maximum(inter_ymax - inter_ymin, 0.0)
             * jnp.maximum(inter_xmax - inter_xmin, 0.0))
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / jnp.maximum(area_a + area_b - inter, 1e-8)


def encode_boxes(gt: jax.Array, anchors: jax.Array,
                 variances=(0.1, 0.2)) -> jax.Array:
    """GT boxes -> regression targets relative to anchors (both [A,4])."""
    a_cy = (anchors[:, 0] + anchors[:, 2]) / 2
    a_cx = (anchors[:, 1] + anchors[:, 3]) / 2
    a_h = jnp.maximum(anchors[:, 2] - anchors[:, 0], 1e-8)
    a_w = jnp.maximum(anchors[:, 3] - anchors[:, 1], 1e-8)
    g_cy = (gt[:, 0] + gt[:, 2]) / 2
    g_cx = (gt[:, 1] + gt[:, 3]) / 2
    g_h = jnp.maximum(gt[:, 2] - gt[:, 0], 1e-8)
    g_w = jnp.maximum(gt[:, 3] - gt[:, 1], 1e-8)
    return jnp.stack([
        (g_cy - a_cy) / a_h / variances[0],
        (g_cx - a_cx) / a_w / variances[0],
        jnp.log(g_h / a_h) / variances[1],
        jnp.log(g_w / a_w) / variances[1]], axis=1)


def decode_boxes(deltas: jax.Array, anchors: jax.Array,
                 variances=(0.1, 0.2)) -> jax.Array:
    """Regression outputs -> (ymin, xmin, ymax, xmax)."""
    a_cy = (anchors[:, 0] + anchors[:, 2]) / 2
    a_cx = (anchors[:, 1] + anchors[:, 3]) / 2
    a_h = jnp.maximum(anchors[:, 2] - anchors[:, 0], 1e-8)
    a_w = jnp.maximum(anchors[:, 3] - anchors[:, 1], 1e-8)
    cy = deltas[:, 0] * variances[0] * a_h + a_cy
    cx = deltas[:, 1] * variances[0] * a_w + a_cx
    h = jnp.exp(jnp.clip(deltas[:, 2] * variances[1], -10, 10)) * a_h
    w = jnp.exp(jnp.clip(deltas[:, 3] * variances[1], -10, 10)) * a_w
    return jnp.clip(jnp.stack([cy - h / 2, cx - w / 2,
                               cy + h / 2, cx + w / 2], axis=1), 0.0, 1.0)


def match_anchors(gt_boxes: jax.Array, gt_classes: jax.Array,
                  gt_valid: jax.Array, anchors: jax.Array,
                  pos_threshold: float = 0.5):
    """Match anchors to GT (jittable, fixed shapes).

    Returns (cls_targets [A] int32, box_targets [A,4], pos_mask [A]).
    Background class = 0.  Every valid GT also claims its best anchor
    (bipartite step), then anchors with IoU >= threshold join.
    """
    iou = iou_matrix(anchors, gt_boxes)                    # [A, M]
    iou = iou * gt_valid[None, :]                          # kill padded gts
    best_gt = jnp.argmax(iou, axis=1)                      # [A]
    best_iou = jnp.max(iou, axis=1)                        # [A]
    # bipartite: each valid gt forces its best STILL-FREE anchor (greedy
    # over gts).  A shared-best scatter would keep only one of two gts
    # whose best anchor coincides — the loser could end up with ZERO
    # positive anchors that step (adjacent small objects in one cell).
    # Padded/difficult rows (valid <= 0) never claim an anchor.
    nb_anchors = anchors.shape[0]

    def claim(g, carry):
        taken, forced, gt_of = carry
        col = jnp.where(taken, -1.0, iou[:, g])
        a = jnp.argmax(col)
        ok = gt_valid[g] > 0.5
        taken = taken.at[a].set(jnp.logical_or(taken[a], ok))
        forced = forced.at[a].max(jnp.where(ok, 1.0, 0.0))
        gt_of = gt_of.at[a].set(jnp.where(ok, g, gt_of[a]))
        return taken, forced, gt_of

    _, forced, gt_of_forced = jax.lax.fori_loop(
        0, gt_boxes.shape[0], claim,
        (jnp.zeros(nb_anchors, bool), jnp.zeros(nb_anchors, jnp.float32),
         jnp.zeros(nb_anchors, jnp.int32)))
    pos_mask = jnp.logical_or(best_iou >= pos_threshold, forced > 0.5)
    gt_idx = jnp.where(forced > 0.5, gt_of_forced, best_gt)
    cls_targets = jnp.where(
        pos_mask, gt_classes[gt_idx].astype(jnp.int32), 0)
    box_targets = encode_boxes(gt_boxes[gt_idx], anchors)
    return cls_targets, box_targets, pos_mask.astype(jnp.float32)
