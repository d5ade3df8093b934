"""Shared detection eval loop (the dump_n_eval driver).

One implementation of the iterate/forward/dump/eval protocol for every
detection helper (reference vgg_at_pascalvoc.py:554-583 — the Faster-RCNN
wrapper reuses the same scaffold), so batch accounting fixes land once:

* the batch count comes from the samples ACTUALLY loaded on this process
  (``nb_smpls_loaded`` after build(): the synthetic fallback and process
  sharding both shrink the set), never from the nominal spec;
* whole batches only (floor): the wrap-around iterator would otherwise
  re-dump the first images as duplicate detections/ground truths and skew
  the mAP.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pocketflow_tpu.core.metrics import get_logger

log = get_logger()


def nb_eval_batches(dataset, nb_batches: Optional[int] = None) -> int:
    """Whole batches covering this process's loaded eval shard once."""
    if nb_batches is not None:
        return nb_batches
    nb_smpls = getattr(dataset, 'nb_smpls_loaded', None)
    if nb_smpls is None:
        nb_smpls = dataset.spec.nb_smpls_eval
    # nb_smpls_loaded is recorded BEFORE the process-shard split
    # (datasets/abstract.py): divide like run_eval_loop does
    return max(1, nb_smpls // (dataset.batch_size
                               * max(1, jax.process_count())))


def run_detection_eval(helper, model, state, dataset, forward_fn,
                       nb_batches: Optional[int] = None):
    """Drive dump_n_eval over the eval set; returns the mAP result dict.

    `forward_fn(variables, images)` is the eval forward; its output is passed
    to ``helper.dump_n_eval((output, labels), 'dump')``.
    Multi-host note: detections are process-local, so the reported mAP is
    over this process's shard (a warning is logged; cross-process detection
    gathering is out of scope).
    """
    iterator = dataset.build()  # build first: it sets nb_smpls_loaded
    nb = nb_eval_batches(dataset, nb_batches)
    if jax.process_count() > 1:
        log.warning('detection eval is process-local: mAP covers this '
                    "process's shard only")
    helper.dump_n_eval(action='init')
    fwd = jax.jit(forward_fn)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    for _ in range(nb):
        batch = next(iterator)
        images = dataset.augment(jnp.asarray(batch['image']),
                                 jax.random.PRNGKey(0), False)
        out = fwd(variables, images)
        helper.dump_n_eval((out, batch['label']), 'dump')
    return helper.dump_n_eval(action='eval')
