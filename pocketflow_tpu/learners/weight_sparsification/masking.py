"""Mask pytrees + dynamic pruning-ratio schedule for weight sparsification.

Functional rebuild of the reference's mask machinery
(/root/reference/learners/weight_sparsification/learner.py:260-332 and
utils.py:19-39).  The reference keeps three TF variables per maskable kernel
(mask, var_bkup, and the kernel itself) wired together with assign ops under
control dependencies; here masks/backups are ordinary pytree leaves in
``TrainState.extra`` and the whole percentile-threshold-and-apply chain is one
pure function fused into the jitted train step.

Maskable variables: every 'kernel' leaf of conv/dense layers (the reference
matches tf.layers kernels plus slim pointwise-conv weights — in this model zoo
all of those are Flax params literally named 'kernel').
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pocketflow_tpu.config import FLAGS


def _key_name(entry) -> str:
    return getattr(entry, 'key', str(entry))


def path_str(path: Tuple) -> str:
    """Stable string id for a params-tree path, e.g. 'conv1/kernel'."""
    return '/'.join(_key_name(p) for p in path)


def is_maskable_path(path: Tuple) -> bool:
    """Kernel leaves of conv/dense layers (reference utils.py:19-39).

    The reference matches tf.layers conv/dense kernels plus slim *pointwise*
    conv weights — slim depthwise weights ('depthwise_weights') are NOT
    maskable.  Our depthwise modules are named 'dw*' (nets/mobilenet.py), so
    kernels under them are excluded the same way."""
    if _key_name(path[-1]) != 'kernel':
        return False
    if len(path) >= 2 and _key_name(path[-2]).startswith('dw'):
        return False
    return True


def maskable_paths(params) -> List[str]:
    """Ordered list of maskable leaf paths (tree-canonical order)."""
    out = []
    for path, _ in jax.tree_util.tree_leaves_with_path(params):
        if is_maskable_path(path):
            out.append(path_str(path))
    return out


def maskable_shapes(params) -> List[Tuple[int, ...]]:
    return [leaf.shape for path, leaf in jax.tree_util.tree_leaves_with_path(params)
            if is_maskable_path(path)]


def build_mask_state(params) -> Dict[str, Any]:
    """Initial extra-state: all-ones masks + weight backups (learner.py:276-282).

    Non-maskable leaves carry scalar placeholders so the trees keep the params
    treedef (cheap: one scalar per leaf, broadcast in tree_map arithmetic).
    """
    def init_mask(path, leaf):
        if is_maskable_path(path):
            return jnp.ones(leaf.shape, jnp.float32)
        return jnp.ones((), jnp.float32)

    def init_bkup(path, leaf):
        if is_maskable_path(path):
            return leaf.astype(jnp.float32)
        return jnp.zeros((), jnp.float32)

    masks = jax.tree_util.tree_map_with_path(init_mask, params)
    bkups = jax.tree_util.tree_map_with_path(init_bkup, params)
    return {'masks': masks, 'bkups': bkups}


def dynamic_prune_ratio(step: jax.Array, nb_iters_train: int,
                        prune_ratio_fnl) -> jax.Array:
    """Zhu&Gupta dynamic schedule (learner.py:296-312):
    pr(t) = pr_fnl * (1 - (1 - base)^ws_prune_ratio_exp), base = clamped
    progress between ws_iter_ratio_beg and ws_iter_ratio_end."""
    idx_beg = int(nb_iters_train * FLAGS.ws_iter_ratio_beg)
    idx_end = int(nb_iters_train * FLAGS.ws_iter_ratio_end)
    denom = max(1, idx_end - idx_beg)
    base = (step.astype(jnp.float32) - idx_beg) / denom
    base = jnp.clip(base, 0.0, 1.0)
    return prune_ratio_fnl * (1.0 - jnp.power(1.0 - base, FLAGS.ws_prune_ratio_exp))


# above this size, find the percentile threshold by bisection (compare+count
# passes) instead of jnp.quantile's full sort — O(26 n) streaming reads vs
# O(n log n) sort on multi-million-element kernels, and far less scratch
_BISECT_MIN_SIZE = 1 << 16


def percentile_threshold_bisect(mag: jax.Array, prune_ratio: jax.Array,
                                nb_iters: int = 26) -> jax.Array:
    """Threshold t such that the fraction of |w| <= t approximates
    prune_ratio, by bisection on [0, max] — each iteration is one fused
    compare+count pass over the tensor (the 'fused mask-update kernel'
    SURVEY.md §2 calls for; a sort would thrash HBM on big kernels)."""
    flat = mag.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    target = jnp.clip(prune_ratio, 0.0, 1.0) * n

    def body(_, bounds):
        lo, hi = bounds
        mid = (lo + hi) * 0.5
        count = jnp.sum(flat <= mid)
        lo = jnp.where(count < target, mid, lo)
        hi = jnp.where(count < target, hi, mid)
        return (lo, hi)

    lo, hi = jax.lax.fori_loop(0, nb_iters, body,
                               (jnp.float32(0.0), jnp.max(flat)))
    return (lo + hi) * 0.5


def percentile_mask(weights: jax.Array, prune_ratio: jax.Array) -> jax.Array:
    """mask = |w| > percentile(|w|, prune_ratio*100) (learner.py:285-287).

    ratio<=0 keeps EVERYTHING: quantile(|w|, 0) is min(|w|), so the naive
    formula would zero every min-magnitude weight of a layer whose ratio is
    exactly 0 (e.g. skip_head_n_tail layers) on every mask refresh."""
    mag = jnp.abs(weights.astype(jnp.float32))
    if mag.size >= _BISECT_MIN_SIZE:
        thres = percentile_threshold_bisect(mag, prune_ratio)
    else:
        thres = jnp.quantile(mag.reshape(-1), jnp.clip(prune_ratio, 0.0, 1.0))
    mask = (mag > thres).astype(jnp.float32)
    return jnp.where(prune_ratio <= 0.0, jnp.ones_like(mask), mask)


def prune_update(params, extra: Dict[str, Any], step: jax.Array,
                 nb_iters_train: int, ratios_fnl: Dict[str, float]):
    """One prune step: refresh backups, recompute masks at the dynamic ratio,
    zero the pruned weights (the reference's var_bkup/mask/prune assign chain,
    learner.py:283-294) — all leaves in one fused pass."""
    masks, bkups = extra['masks'], extra['bkups']

    def upd(path, p, m, b):
        if not is_maskable_path(path):
            return p, m, b
        ratio = dynamic_prune_ratio(step, nb_iters_train,
                                    float(ratios_fnl[path_str(path)]))
        b = jnp.where(m > 0.5, p.astype(jnp.float32), b)
        m = percentile_mask(b, ratio)
        return (b * m).astype(p.dtype), m, b

    triples = jax.tree_util.tree_map_with_path(
        lambda path, p, m, b: upd(path, p, m, b), params, masks, bkups)
    # unzip the (param, mask, bkup) leaf-tuples back into three trees
    treedef = jax.tree_util.tree_structure(params)
    leaves = treedef.flatten_up_to(triples)
    new_params = treedef.unflatten([t[0] for t in leaves])
    new_masks = treedef.unflatten([t[1] for t in leaves])
    new_bkups = treedef.unflatten([t[2] for t in leaves])
    return new_params, {'masks': new_masks, 'bkups': new_bkups}


def mask_gradients(grads, masks):
    """grad <- grad * mask on maskable leaves (learner.py:314-332)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, g, m: g * m.astype(g.dtype) if is_maskable_path(path) else g,
        grads, masks)


def apply_masks(params, masks):
    """params <- params * mask (the prune assign, without mask refresh)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, p, m: (p.astype(jnp.float32) * m).astype(p.dtype)
        if is_maskable_path(path) else p,
        params, masks)


def masks_from_ratios(params, ratios: Dict[str, Any]):
    """Build masks at explicit per-layer ratios (PROptimizer roll-outs)."""
    def mk(path, p):
        if not is_maskable_path(path):
            return jnp.ones((), jnp.float32)
        return percentile_mask(p, jnp.asarray(ratios[path_str(path)], jnp.float32))
    return jax.tree_util.tree_map_with_path(mk, params)


def calc_prune_ratio(params, maskable_only: bool = False):
    """Overall fraction of zero weights (reference learner.py:51-63)."""
    nnz = jnp.zeros((), jnp.float32)
    tot = jnp.zeros((), jnp.float32)
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        if maskable_only and not is_maskable_path(path):
            continue
        nnz = nnz + jnp.sum(leaf != 0).astype(jnp.float32)
        tot = tot + np.prod(leaf.shape)
    return 1.0 - nnz / jnp.maximum(tot, 1.0)
