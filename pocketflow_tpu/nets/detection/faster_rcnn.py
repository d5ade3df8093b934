"""Faster-RCNN core: RPN, fixed-shape proposal layer, ROI-align, heads.

Rebuild of the Faster-RCNN implementation the reference vendors under
/root/reference/utils/external/ (wrapped by nets/faster_rcnn_at_pascalvoc.py:
471-513; ~1.4k LoC of TF py_func-heavy code).  TPU-first redesign:

* the proposal layer (decode -> clip -> top-k -> NMS) runs INSIDE jit with
  fixed shapes: `nms_fixed` is a lax.fori_loop greedy NMS that always emits
  ``nb_proposals`` slots (invalid ones carry score 0) — no dynamic shapes,
  no host round-trips (the reference uses py_func for this);
* ROI-align is a vmap'd bilinear gather on the feature map;
* anchor/proposal target assignment (the reference's anchor_target_layer /
  proposal_target_layer py_funcs) are pure jittable functions built on
  nets/detection/anchors.py matching.

Everything consumes labels inside the forward pass — the reason the
reference sets ``forward_w_labels=True`` for this model family.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pocketflow_tpu.nets.detection import anchors as anchor_lib
from pocketflow_tpu.nets.detection.ssd_loss import smooth_l1


def nms_fixed(boxes: jax.Array, scores: jax.Array, max_out: int,
              iou_threshold: float = 0.7) -> Tuple[jax.Array, jax.Array]:
    """Greedy NMS with a FIXED number of outputs (jittable).

    Returns (indices [max_out], valid [max_out]) — picks in score order,
    suppressing overlaps; unfilled slots are marked invalid.
    """
    nb = boxes.shape[0]
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) \
        * jnp.maximum(boxes[:, 3] - boxes[:, 1], 0.0)

    def body(i, carry):
        alive, out_idx, out_valid = carry
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        ok = masked[best] > -jnp.inf
        out_idx = out_idx.at[i].set(best)
        out_valid = out_valid.at[i].set(ok)
        # suppress overlaps with the pick
        yx1 = jnp.maximum(boxes[best, :2], boxes[:, :2])
        yx2 = jnp.minimum(boxes[best, 2:], boxes[:, 2:])
        wh = jnp.maximum(yx2 - yx1, 0.0)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / jnp.maximum(area[best] + area - inter, 1e-8)
        alive = jnp.logical_and(alive, iou <= iou_threshold)
        alive = alive.at[best].set(False)
        return alive, out_idx, out_valid

    alive0 = jnp.ones(nb, bool)
    _, idx, valid = jax.lax.fori_loop(
        0, max_out, body,
        (alive0, jnp.zeros(max_out, jnp.int32), jnp.zeros(max_out, bool)))
    return idx, valid


def propose(rpn_scores: jax.Array, rpn_deltas: jax.Array, anchors: jax.Array,
            nb_pre_nms: int, nb_proposals: int,
            iou_threshold: float = 0.7) -> Tuple[jax.Array, jax.Array]:
    """Proposal layer for one image: top-k by objectness, decode, NMS.

    Returns (proposal boxes [nb_proposals, 4], valid [nb_proposals])."""
    scores, order = jax.lax.top_k(rpn_scores, min(nb_pre_nms, rpn_scores.shape[0]))
    boxes = anchor_lib.decode_boxes(rpn_deltas[order], anchors[order])
    idx, valid = nms_fixed(boxes, scores, nb_proposals, iou_threshold)
    return boxes[idx], valid


def roi_align(features: jax.Array, rois: jax.Array,
              output_size: int = 7) -> jax.Array:
    """Bilinear ROI-align for one image.

    features [H, W, C], rois [R, 4] normalized (ymin, xmin, ymax, xmax)
    -> [R, output_size, output_size, C].
    """
    H, W = features.shape[:2]

    def one_roi(roi):
        ys = jnp.linspace(roi[0], roi[2], output_size) * (H - 1)
        xs = jnp.linspace(roi[1], roi[3], output_size) * (W - 1)
        y0 = jnp.clip(jnp.floor(ys), 0, H - 2).astype(jnp.int32)
        x0 = jnp.clip(jnp.floor(xs), 0, W - 2).astype(jnp.int32)
        wy = (ys - y0).clip(0.0, 1.0)
        wx = (xs - x0).clip(0.0, 1.0)
        f00 = features[y0][:, x0]          # [S, S, C]
        f01 = features[y0][:, x0 + 1]
        f10 = features[y0 + 1][:, x0]
        f11 = features[y0 + 1][:, x0 + 1]
        wy_ = wy[:, None, None]
        wx_ = wx[None, :, None]
        return (f00 * (1 - wy_) * (1 - wx_) + f01 * (1 - wy_) * wx_
                + f10 * wy_ * (1 - wx_) + f11 * wy_ * wx_)

    return jax.vmap(one_roi)(rois)


def _match_gt(boxes: jax.Array, gt_boxes: jax.Array, gt_valid: jax.Array):
    """Shared matching core: per-box best valid gt (IoU-weighted).

    One copy of the iou*valid / best_iou / best_gt triplet used by
    rpn_targets, proposal_targets, and sample_rois — the subtle parts of
    matching (padding gts zeroed via gt_valid) live here once."""
    iou = anchor_lib.iou_matrix(boxes, gt_boxes) * gt_valid[None, :]
    return iou, jnp.max(iou, axis=1), jnp.argmax(iou, axis=1)


def rpn_targets(gt_boxes: jax.Array, gt_valid: jax.Array, anchors: jax.Array,
                pos_iou: float = 0.7, neg_iou: float = 0.3):
    """Anchor-target layer: objectness labels (1/0/-1=ignore) + box targets."""
    iou, best_iou, best_gt = _match_gt(anchors, gt_boxes, gt_valid)
    # every valid gt claims its best anchor
    best_anchor = jnp.argmax(iou, axis=0)
    forced = jnp.zeros(anchors.shape[0], jnp.float32).at[best_anchor].max(gt_valid)
    labels = jnp.where(best_iou >= pos_iou, 1, -1)
    labels = jnp.where(best_iou < neg_iou, 0, labels)
    labels = jnp.where(forced > 0.5, 1, labels)
    box_t = anchor_lib.encode_boxes(gt_boxes[best_gt], anchors)
    return labels, box_t


def proposal_targets(proposals: jax.Array, valid: jax.Array,
                     gt_boxes: jax.Array, gt_classes: jax.Array,
                     gt_valid: jax.Array, fg_iou: float = 0.5):
    """Proposal-target layer: per-ROI class labels + box regression targets."""
    _, best_iou, best_gt = _match_gt(proposals, gt_boxes, gt_valid)
    fg = jnp.logical_and(best_iou >= fg_iou, valid)
    cls_t = jnp.where(fg, gt_classes[best_gt].astype(jnp.int32), 0)
    box_t = anchor_lib.encode_boxes(gt_boxes[best_gt], proposals)
    return cls_t, box_t, fg.astype(jnp.float32), valid.astype(jnp.float32)


def sample_rois(proposals: jax.Array, valid: jax.Array, gt_boxes: jax.Array,
                gt_classes: jax.Array, gt_valid: jax.Array, rng: jax.Array,
                nb_rois: int, fg_fraction: float = 0.25,
                fg_iou: float = 0.5, bg_iou_lo: float = 0.0):
    """Fixed-shape fg/bg ROI minibatch sampling (proposal_target_layer).

    The reference samples a fixed ROI minibatch per image with a foreground
    fraction (py-faster-rcnn semantics behind
    /root/reference/nets/faster_rcnn_at_pascalvoc.py:471-513's vendored
    proposal_target_layer): up to ``fg_fraction * nb_rois`` foreground ROIs
    (IoU >= fg_iou), the rest background.  Jittable redesign: score every
    proposal with a priority = (is_candidate << 20) + random tiebreak, take
    top-k foregrounds and top-k backgrounds by priority, concatenate.

    Returns (roi_idx [nb_rois], cls_t, box_t, fg, valid_mask).
    """
    _, best_iou, best_gt = _match_gt(proposals, gt_boxes, gt_valid)
    is_fg = jnp.logical_and(best_iou >= fg_iou, valid)
    is_bg = jnp.logical_and(jnp.logical_and(best_iou < fg_iou,
                                            best_iou >= bg_iou_lo), valid)
    k_fg = int(round(nb_rois * fg_fraction))
    k_bg = nb_rois - k_fg
    if rng is not None:
        tie = jax.random.uniform(rng, best_iou.shape)
    else:
        # deterministic data-dependent tiebreak: varies with the proposal
        # coordinates, so the sampled minibatch changes as training moves
        h = jnp.sin(jnp.sum(proposals * jnp.asarray(
            [12.9898, 78.233, 37.719, 4.581], proposals.dtype), axis=1)
            * 43758.5453)
        tie = h - jnp.floor(h)
    fg_rank = jnp.where(is_fg, 1.0 + tie, tie * 1e-3)
    bg_rank = jnp.where(is_bg, 1.0 + tie, tie * 1e-3)
    _, fg_idx = jax.lax.top_k(fg_rank, k_fg)
    _, bg_idx = jax.lax.top_k(bg_rank, k_bg)
    roi_idx = jnp.concatenate([fg_idx, bg_idx])
    # a slot is real fg/bg only if its candidate mask held (top_k may have
    # been forced to fill from non-candidates)
    fg = jnp.concatenate([is_fg[fg_idx],
                          jnp.zeros(k_bg, bool)]).astype(jnp.float32)
    slot_valid = jnp.concatenate([is_fg[fg_idx], is_bg[bg_idx]])
    cls_t = jnp.where(fg > 0.5,
                      gt_classes[best_gt[roi_idx]].astype(jnp.int32), 0)
    box_t = anchor_lib.encode_boxes(gt_boxes[best_gt[roi_idx]],
                                    proposals[roi_idx])
    return roi_idx, cls_t, box_t, fg, slot_valid.astype(jnp.float32)


def rpn_loss(obj_logits: jax.Array, rpn_deltas: jax.Array,
             labels: jax.Array, box_targets: jax.Array,
             minibatch: int = 256, max_fg_fraction: float = 0.5) -> jax.Array:
    """Objectness BCE (ignoring label -1) + smooth-L1 on positives.

    The reference's anchor_target_layer subsamples a 256-anchor minibatch
    with up to 50% positives; without that, at real VOC resolutions (~46k
    anchors, tens positive) the positives contribute ~0.1% of a
    count-normalized BCE and objectness collapses toward all-negative.
    Jit-friendly equivalent: weight the classes by the EXPECTED sampled
    proportions — n_pos_s = min(n_pos, 128) positives + (256 - n_pos_s)
    negatives, normalized by 256 (the expectation of the reference's
    subsampled loss, deterministic instead of randomly thinned).
    """
    valid = (labels >= 0).astype(jnp.float32)
    pos = (labels == 1).astype(jnp.float32)
    neg = valid * (1.0 - pos)
    logp = jax.nn.log_sigmoid(obj_logits)
    log1p = jax.nn.log_sigmoid(-obj_logits)
    bce = -(pos * logp + (1.0 - pos) * log1p) * valid
    nb_pos = jnp.maximum(jnp.sum(pos), 1.0)
    nb_neg = jnp.maximum(jnp.sum(neg), 1.0)
    pos_mean = jnp.sum(bce * pos) / nb_pos
    neg_mean = jnp.sum(bce * neg) / nb_neg
    n_pos_s = jnp.minimum(nb_pos, minibatch * max_fg_fraction)
    n_neg_s = minibatch - n_pos_s
    cls = (n_pos_s * pos_mean + n_neg_s * neg_mean) / minibatch
    loc = jnp.sum(smooth_l1(rpn_deltas - box_targets), axis=1) * pos
    return cls + jnp.sum(loc) / nb_pos


def rcnn_loss(cls_logits: jax.Array, box_deltas: jax.Array,
              cls_targets: jax.Array, box_targets: jax.Array,
              fg: jax.Array, valid: jax.Array) -> jax.Array:
    """Per-ROI CE + class-specific smooth-L1 on foreground ROIs."""
    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32))
    ce = -jnp.take_along_axis(logp, cls_targets[:, None], axis=1)[:, 0] * valid
    nb_valid = jnp.maximum(jnp.sum(valid), 1.0)
    nb_fg = jnp.maximum(jnp.sum(fg), 1.0)
    nb_classes = cls_logits.shape[-1]
    deltas = box_deltas.reshape(-1, nb_classes, 4)
    own = jnp.take_along_axis(
        deltas, cls_targets[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    loc = jnp.sum(smooth_l1(own - box_targets), axis=1) * fg
    return jnp.sum(ce) / nb_valid + jnp.sum(loc) / nb_fg
