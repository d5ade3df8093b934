"""SSD multibox loss with hard negative mining — one fused jittable function.

Rebuild of the SSD loss in /root/reference/nets/vgg_at_pascalvoc.py:286-411
(vendored from ssd_tensorflow): cross-entropy on matched anchors + the top
``negative_ratio`` x #positives hardest negatives, smooth-L1 on box targets.
The reference's boolean-mask + dynamic top_k graph gymnastics become a fixed
-shape sort (TPU-friendly; no dynamic shapes anywhere).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from pocketflow_tpu.nets.detection import anchors as anchor_lib


def smooth_l1(x: jax.Array) -> jax.Array:
    absx = jnp.abs(x)
    return jnp.where(absx < 1.0, 0.5 * x * x, absx - 0.5)


def ssd_loss(cls_logits: jax.Array, box_deltas: jax.Array,
             labels: jax.Array, anchors: jax.Array,
             negative_ratio: float = 3.0,
             pos_threshold: float = 0.5) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """cls_logits [B,A,C], box_deltas [B,A,4], labels [B,M,6] -> (loss, metrics).

    labels rows: [class, ymin, xmin, ymax, xmax, valid].
    """
    def per_image(logits, deltas, lab):
        gt_cls = lab[:, 0]
        gt_boxes = lab[:, 1:5]
        gt_valid = lab[:, 5]
        cls_t, box_t, pos = anchor_lib.match_anchors(
            gt_boxes, gt_cls, gt_valid, anchors, pos_threshold)
        nb_pos = jnp.maximum(jnp.sum(pos), 1.0)

        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32))
        ce = -jnp.take_along_axis(log_probs, cls_t[:, None], axis=1)[:, 0]

        # hard negative mining: top (ratio * nb_pos) background anchors by loss
        neg_scores = jnp.where(pos > 0.5, -jnp.inf, ce)
        order = jnp.argsort(-neg_scores)
        ranks = jnp.argsort(order)  # rank of each anchor among negatives
        nb_neg = jnp.minimum(negative_ratio * nb_pos,
                             jnp.asarray(logits.shape[0], jnp.float32))
        neg_mask = (ranks < nb_neg).astype(jnp.float32) * (1.0 - pos)

        cls_loss = jnp.sum(ce * (pos + neg_mask)) / nb_pos
        loc = smooth_l1(deltas.astype(jnp.float32) - box_t)
        loc_loss = jnp.sum(jnp.sum(loc, axis=1) * pos) / nb_pos
        return cls_loss, loc_loss, jnp.sum(pos)

    cls_losses, loc_losses, nb_pos = jax.vmap(per_image)(
        cls_logits, box_deltas, labels)
    loss = jnp.mean(cls_losses) + jnp.mean(loc_losses)
    metrics = {'cls_loss': jnp.mean(cls_losses),
               'loc_loss': jnp.mean(loc_losses),
               'nb_pos_anchors': jnp.mean(nb_pos)}
    return loss, metrics
