"""Shared detection eval loop (the dump_n_eval driver).

One implementation of the iterate/forward/dump/eval protocol for every
detection helper (reference vgg_at_pascalvoc.py:554-583 — the Faster-RCNN
wrapper reuses the same scaffold), so batch accounting fixes land once:

* the batch count comes from the samples ACTUALLY loaded (``nb_smpls_loaded``
  after build(): the synthetic fallback shrinks the set), never from the
  nominal spec;
* whole batches only (floor): the wrap-around iterator would otherwise
  re-dump the first images as duplicate detections/ground truths and skew
  the mAP;
* under multi-host, per-process detections and ground truths are packed to
  fixed shapes and allgathered before scoring, so the reported mAP covers
  the FULL eval set on every process (reference parity: dump_n_eval scores
  all 4,952 VOC test images, vgg_at_pascalvoc.py:554-583).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _per_process_eval_count(dataset) -> int:
    """Samples this process must score: the FULL local shard single-host
    (reference parity: all 4,952 VOC test images), the equal floor share
    under multi-host (the allgather needs equal per-process counts; up to
    P-1 samples are dropped and logged)."""
    nb_smpls = getattr(dataset, 'nb_smpls_loaded', None)
    if nb_smpls is None:
        nb_smpls = dataset.spec.nb_smpls_eval
    nb_procs = max(1, jax.process_count())
    return max(1, nb_smpls // nb_procs) if nb_procs > 1 else nb_smpls


def nb_eval_batches(dataset, nb_batches: Optional[int] = None) -> int:
    """Batches covering this process's eval share once (CEIL — the dump
    loop truncates the wrap-around tail so no image is scored twice and,
    single-host, none is dropped)."""
    if nb_batches is not None:
        return nb_batches
    return max(1, -(-_per_process_eval_count(dataset) // dataset.batch_size))


def allgather_detections(detections: List[List[dict]],
                         groundtruth: List[np.ndarray],
                         ) -> Tuple[List[List[dict]], List[np.ndarray]]:
    """Gather per-process detection dumps into the global eval set.

    Detections are variable-length lists of {'class','score','box'} dicts;
    they are packed into a fixed [n_img, cap, 6] array (cap = global max
    detections/image, agreed via a scalar allgather), allgathered over
    processes together with the fixed-shape ground-truth arrays, and
    unpacked back — the collective replacement for the reference's
    file-based detection dumps (each rank writing txt files rank 0 scores).
    """
    from jax.experimental import multihost_utils

    n_img = len(detections)
    local_max = max((len(d) for d in detections), default=0)
    cap = int(np.max(multihost_utils.process_allgather(
        np.asarray([local_max], np.int32))))
    cap = max(cap, 1)
    packed = np.zeros((n_img, cap, 6), np.float32)
    for i, dets in enumerate(detections):
        for j, d in enumerate(dets):
            packed[i, j, 0] = float(d['class'])
            packed[i, j, 1] = float(d['score'])
            packed[i, j, 2:6] = np.asarray(d['box'], np.float32)
    counts = np.asarray([len(d) for d in detections], np.int32)
    gts = np.stack([np.asarray(g, np.float32) for g in groundtruth])

    g_packed = multihost_utils.process_allgather(packed)    # [P, n_img, cap, 6]
    g_counts = multihost_utils.process_allgather(counts)    # [P, n_img]
    g_gts = multihost_utils.process_allgather(gts)          # [P, n_img, M, 6]

    all_dets: List[List[dict]] = []
    all_gts: List[np.ndarray] = []
    for p in range(g_packed.shape[0]):
        for i in range(n_img):
            dets = []
            for j in range(int(g_counts[p, i])):
                row = np.asarray(g_packed[p, i, j])
                dets.append({'class': int(row[0]), 'score': float(row[1]),
                             'box': row[2:6].copy()})
            all_dets.append(dets)
            all_gts.append(np.asarray(g_gts[p, i]))
    return all_dets, all_gts


def run_detection_eval(helper, model, state, dataset, forward_fn,
                       nb_batches: Optional[int] = None):
    """Drive dump_n_eval over the eval set; returns the mAP result dict.

    `forward_fn(variables, images)` is the eval forward; its output is passed
    to ``helper.dump_n_eval((output, labels), 'dump')``.  The dump_n_eval
    protocol stores per-image results in ``helper._detections`` /
    ``helper._groundtruth`` (both detection helpers share this contract);
    under multi-host those are allgathered before 'eval' so the mAP is
    global.
    """
    iterator = dataset.build()  # build first: it sets nb_smpls_loaded
    nb = nb_eval_batches(dataset, nb_batches)
    helper.dump_n_eval(action='init')
    fwd = jax.jit(forward_fn)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    for _ in range(nb):
        batch = next(iterator)
        # the whole-batch entry point: augment_batch keeps labels consistent
        # with any eval-time image transform and unpacks packed label
        # metadata (datasets/abstract.py augment_xy contract)
        abatch = dataset.augment_batch(
            {k: jnp.asarray(v) for k, v in batch.items()},
            jax.random.PRNGKey(0), False)
        out = fwd(variables, abatch['image'])
        helper.dump_n_eval((out, abatch['label']), 'dump')
    if nb_batches is None:
        # ceil coverage wraps the iterator past the set: drop the re-dumped
        # head so every image is scored exactly once
        target = _per_process_eval_count(dataset)
        helper._detections = helper._detections[:target]
        helper._groundtruth = helper._groundtruth[:target]
    if jax.process_count() > 1:
        helper._detections, helper._groundtruth = allgather_detections(
            helper._detections, helper._groundtruth)
    return helper.dump_n_eval(action='eval')
