"""Residual-aware physical channel shrink: the capture-trace graph analysis.

The reference's channel-pruned export walks the TF graph with
`model_wrapper.py:31-369` to find each conv's *fathers* (producers) and
*children* (consumers) and the residual Adds between them, so that a channel
pruned from a consumer's input is also removed from every producer's output —
the physically-smaller convs behind the published mobile latency wins
(`/root/reference/learners/channel_pruning/channel_pruner.py:579-586`).

The TPU-native redo captures the same graph from the **jaxpr** of the eval
forward (the JAX analogue of the frozen graph):

1. trace `model.apply` with `jax.make_jaxpr`, mapping jaxpr input vars to
   param-tree paths;
2. propagate *channel provenance* through the equations — which conv's
   output channels a value's last axis corresponds to.  Elementwise ops,
   pooling, spatial reductions, and squeeze-style reshapes preserve channel
   identity; residual `add` merges two producer sets; depthwise convs map
   channels 1:1 (consumer AND pass-through); anything that mixes the channel
   axis (space-to-depth transposes, flatten with spatial extent) breaks it;
3. every conv/dense input site records (consumer kernel path, producer set,
   clean?).  Producers whose outputs escape through a non-clean path (or to
   the model output) are *protected*.

`shrink_residual_aware` then union-finds producer components across residual
merges, intersects the consumers' surviving-channel sets per component, and
slices: producer kernels' output dim, their BN/bias params, depthwise kernels,
and consumer kernels' input dim — a consistent, physically smaller network.
Dead channels were exactly zero in every consumer, so scattering the shrunk
tree back to dense reproduces the original logits bit-for-bit (tested).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, FrozenSet, List, Optional, Sequence, Tuple

import jax
import numpy as np

from pocketflow_tpu.core.metrics import get_logger
from pocketflow_tpu.learners.weight_sparsification import masking

log = get_logger()

# ---------------------------------------------------------------------------
# provenance lattice
# ---------------------------------------------------------------------------

BROKEN = ('broken',)
INPUT = ('input',)


def _merge_prov(a, b):
    """Join two channel provenances (for residual adds)."""
    if a is None:
        return b
    if b is None:
        return a
    if a == BROKEN or b == BROKEN or a == INPUT or b == INPUT:
        return BROKEN
    return ('merge', frozenset(_producers(a) | _producers(b)))


def _producers(prov) -> FrozenSet[str]:
    if prov is None or prov in (BROKEN, INPUT):
        return frozenset()
    if prov[0] == 'conv':
        return frozenset([prov[1]])
    return prov[1]


@dataclass
class ConsumerSite:
    """One conv/dense input site: which producers feed its channel axis."""
    consumer: str                 # kernel param path (module path)
    producers: FrozenSet[str]
    clean: bool                   # provenance was unbroken conv/merge
    in_dim: int                   # kernel axis indexing input channels
    depthwise: bool = False


@dataclass
class ConvGraph:
    sites: List[ConsumerSite] = field(default_factory=list)
    protected: set = field(default_factory=set)   # producers we must not shrink
    depthwise: set = field(default_factory=set)   # depthwise kernel paths


# ---------------------------------------------------------------------------
# jaxpr capture
# ---------------------------------------------------------------------------

_ELEMENTWISE = {
    'convert_element_type', 'exp', 'log', 'tanh', 'logistic',
    'rsqrt', 'sqrt', 'abs', 'sign', 'floor', 'ceil', 'round',
    'integer_pow', 'pow', 'neg', 'stop_gradient', 'erf',
    'copy',
}
# 'max'/'min' are two-operand: they need the merge/protect logic, not the
# first-operand pass-through ('clamp'/'select_n' get dedicated branches —
# their DATA operand is not invals[0])
_BINARY = {'add', 'sub', 'mul', 'div', 'max', 'min'}


def _param_paths_in_order(variables) -> List[Optional[str]]:
    """Param path per flattened leaf of `variables` (None for non-kernels)."""
    leaves = jax.tree_util.tree_leaves_with_path(variables)
    return [masking.path_str(path) for path, _ in leaves]


def capture_conv_graph(model, variables, sample_shape: Sequence[int],
                       dtype=np.float32) -> ConvGraph:
    """Trace the eval forward and extract the conv producer/consumer graph."""
    import jax.numpy as jnp
    x = jax.ShapeDtypeStruct(tuple(sample_shape), dtype)
    var_structs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype
                                       if not hasattr(a, 'dtype') else a.dtype),
        variables)
    closed = jax.make_jaxpr(
        lambda v, img: model.apply(v, img, train=False))(var_structs, x)

    paths = _param_paths_in_order(variables)
    # module paths are relative to the 'params' collection
    paths = [p[len('params/'):] if p.startswith('params/') else None
             for p in paths]
    jaxpr = closed.jaxpr
    nb_param_leaves = len(paths)

    prov: Dict[Any, Any] = {}         # var -> channel provenance
    param_of: Dict[Any, Optional[str]] = {}  # var -> param path (weight tracking)
    graph = ConvGraph()

    def _is_literal(v):
        return hasattr(v, 'val') or type(v).__name__ == 'Literal'

    def get_prov(v):
        if _is_literal(v):
            return None
        return prov.get(v)

    def get_param(v):
        if _is_literal(v):
            return None
        return param_of.get(v)

    # invars: first the flattened variables, then the image
    for idx, v in enumerate(jaxpr.invars):
        if idx < nb_param_leaves:
            param_of[v] = paths[idx]
        else:
            prov[v] = INPUT

    def protect(p):
        graph.protected.update(_producers(p))

    def walk(jaxpr):
        for eqn in jaxpr.eqns:
            name = eqn.primitive.name
            invals = eqn.invars
            out = eqn.outvars[0] if eqn.outvars else None

            if name in ('pjit', 'jit', 'closed_call'):
                # ('jit' is the pjit primitive's name in current JAX; relu's
                # custom_jvp call_jaxpr wraps its body in one)
                inner = eqn.params['jaxpr'].jaxpr
                for outer, innerv in zip(invals, inner.invars):
                    if get_prov(outer) is not None:
                        prov[innerv] = get_prov(outer)
                    if get_param(outer) is not None:
                        param_of[innerv] = get_param(outer)
                walk(inner)
                for outer, innerv in zip(eqn.outvars, inner.outvars):
                    if get_prov(innerv) is not None:
                        prov[outer] = get_prov(innerv)
                    if get_param(innerv) is not None:
                        param_of[outer] = get_param(innerv)
                continue

            if name == 'conv_general_dilated':
                lhs, rhs = invals[0], invals[1]
                kpath = get_param(rhs)
                fgc = eqn.params.get('feature_group_count', 1)
                in_prov = get_prov(lhs)
                module = (kpath[:-len('/kernel')]
                          if kpath and kpath.endswith('/kernel') else kpath)
                nb_in = rhs.aval.shape[2] if len(rhs.aval.shape) == 4 else None
                if module is None:
                    # unknown kernel source: output channels untrackable
                    protect(in_prov)
                    prov[out] = BROKEN
                    continue
                if fgc > 1 and nb_in == 1:
                    # depthwise: channels map 1:1 input->output
                    graph.depthwise.add(module)
                    graph.sites.append(ConsumerSite(
                        consumer=module, producers=_producers(in_prov),
                        clean=(in_prov is not None and in_prov not in (BROKEN, INPUT)
                               and len(_producers(in_prov)) > 0),
                        in_dim=3, depthwise=True))
                    prov[out] = in_prov  # pass-through identity
                elif fgc == 1:
                    graph.sites.append(ConsumerSite(
                        consumer=module, producers=_producers(in_prov),
                        clean=(in_prov is not None and in_prov not in (BROKEN, INPUT)
                               and len(_producers(in_prov)) > 0),
                        in_dim=2))
                    prov[out] = ('conv', module)
                else:
                    protect(in_prov)
                    prov[out] = BROKEN
                continue

            if name == 'dot_general':
                lhs, rhs = invals[0], invals[1]
                kpath = get_param(rhs)
                in_prov = get_prov(lhs)
                dims = eqn.params['dimension_numbers']
                contract = dims[0]
                module = (kpath[:-len('/kernel')]
                          if kpath and kpath.endswith('/kernel') else kpath)
                # standard dense: contract lhs last dim with rhs dim 0
                if (module is not None
                        and tuple(contract[0]) == (len(lhs.aval.shape) - 1,)
                        and tuple(contract[1]) == (0,)):
                    graph.sites.append(ConsumerSite(
                        consumer=module, producers=_producers(in_prov),
                        clean=(in_prov is not None and in_prov not in (BROKEN, INPUT)
                               and len(_producers(in_prov)) > 0),
                        in_dim=0))
                    prov[out] = ('conv', module)
                else:
                    protect(in_prov)
                    protect(get_prov(rhs))
                    prov[out] = BROKEN
                continue

            if name in _BINARY:
                a, b = invals[0], invals[1]
                pa, pb = get_prov(a), get_prov(b)
                a_shape = a.aval.shape if hasattr(a, 'aval') else ()
                b_shape = b.aval.shape if hasattr(b, 'aval') else ()
                if pa is not None and pb is not None and a_shape == b_shape:
                    merged = _merge_prov(pa, pb)      # residual merge
                    if merged == BROKEN:
                        # one side is untracked (BROKEN/INPUT): the other
                        # side's producers are still READ here, so they must
                        # never be shrunk via some other clean consumer
                        protect(pa)
                        protect(pb)
                    prov[out] = merged
                elif pa is not None and pb is not None:
                    # BOTH operands tracked but shape-mismatched (SE-style
                    # gating: features x broadcast gate): we cannot align
                    # their channel axes, so be conservative — protect both
                    # sides' producers and mark the result broken
                    protect(pa)
                    protect(pb)
                    prov[out] = BROKEN
                else:
                    # broadcast with per-channel params / scalars: pass through
                    prov[out] = pa if pa is not None else pb
                # weight provenance passes through elementwise chains
                # (policies multiply kernels by masks, cast dtypes, etc.)
                wp = get_param(a) or get_param(b)
                if wp is not None:
                    param_of[out] = wp
                continue

            if name in ('custom_jvp_call', 'custom_vjp_call'):
                # recurse into the primal jaxpr (like the pjit branch) so a
                # custom-derivative op that mixes the channel axis inside is
                # analyzed for real instead of assumed elementwise
                closed_inner = eqn.params.get('call_jaxpr')
                inner = getattr(closed_inner, 'jaxpr', closed_inner)
                if inner is not None and len(inner.invars) == len(invals):
                    for outer, innerv in zip(invals, inner.invars):
                        if get_prov(outer) is not None:
                            prov[innerv] = get_prov(outer)
                        if get_param(outer) is not None:
                            param_of[innerv] = get_param(outer)
                    walk(inner)
                    for outer, innerv in zip(eqn.outvars, inner.outvars):
                        if get_prov(innerv) is not None:
                            prov[outer] = get_prov(innerv)
                        if get_param(innerv) is not None:
                            param_of[outer] = get_param(innerv)
                else:
                    # unknown calling convention: be conservative — protect
                    # every tracked input so nothing it reads gets shrunk
                    for src in invals:
                        protect(get_prov(src))
                    if out is not None:
                        prov[out] = BROKEN
                continue

            if name in _ELEMENTWISE:
                src = invals[0]
                if get_prov(src) is not None and out is not None:
                    prov[out] = get_prov(src)
                if get_param(src) is not None and out is not None:
                    param_of[out] = get_param(src)
                continue

            if name == 'clamp':
                # operand order is (min, x, max): the DATA operand is
                # invals[1] — treating invals[0] as data would silently drop
                # the clipped activation's provenance (relu6 via jnp.clip)
                lo, src, hi = invals[0], invals[1], invals[2]
                protect(get_prov(lo))
                protect(get_prov(hi))
                if get_prov(src) is not None and out is not None:
                    prov[out] = get_prov(src)
                if get_param(src) is not None and out is not None:
                    param_of[out] = get_param(src)
                continue

            if name == 'select_n':
                # (pred, case0, case1, ...): merge the case provenances like
                # a residual add; a tracked predicate is only read
                protect(get_prov(invals[0]))
                case_provs = [get_prov(v) for v in invals[1:]]
                tracked = [p for p in case_provs if p is not None]
                if out is not None and tracked:
                    if len(tracked) == len(case_provs):
                        merged = tracked[0]
                        for p in tracked[1:]:
                            merged = _merge_prov(merged, p)
                    else:
                        merged = BROKEN  # mixed tracked/untracked branches
                    if merged == BROKEN:
                        for p in tracked:
                            protect(p)
                    prov[out] = merged
                continue

            if name in ('reduce_window_max', 'reduce_window_sum',
                        'reduce_window', 'reduce_window_min'):
                # pooling: window over spatial dims only in the zoo
                wd = eqn.params.get('window_dimensions')
                src_prov = get_prov(invals[0])
                if wd is not None and wd[-1] == 1:
                    prov[out] = src_prov
                else:
                    protect(src_prov)
                    prov[out] = BROKEN
                continue

            if name in ('reduce_sum', 'reduce_max', 'reduce_min', 'reduce_mean',
                        'reduce_prod'):
                axes = eqn.params.get('axes', ())
                src = invals[0]
                rank = len(src.aval.shape)
                if (rank - 1) not in axes:
                    prov[out] = get_prov(src)   # channel axis survives, stays last
                else:
                    protect(get_prov(src))
                continue

            if name == 'reshape':
                src = invals[0]
                if (src.aval.shape and out.aval.shape
                        and src.aval.shape[-1] == out.aval.shape[-1]):
                    prov[out] = get_prov(src)
                    if get_param(src) is not None:
                        param_of[out] = get_param(src)
                else:
                    protect(get_prov(src))
                    prov[out] = BROKEN
                continue

            if name in ('squeeze', 'expand_dims'):
                prov[out] = get_prov(invals[0])
                continue

            if name == 'broadcast_in_dim':
                src = invals[0]
                if get_param(src) is not None:
                    param_of[out] = get_param(src)
                # per-channel param broadcast carries no activation
                # provenance — but a TRACKED activation being broadcast
                # (gating patterns) is read here, so protect its producers
                # instead of silently dropping them
                if get_prov(src) is not None:
                    protect(get_prov(src))
                    prov[out] = BROKEN
                continue

            if name == 'transpose':
                src = invals[0]
                perm = eqn.params['permutation']
                if perm[-1] == len(perm) - 1:
                    prov[out] = get_prov(src)
                else:
                    protect(get_prov(src))
                    prov[out] = BROKEN
                continue

            if name == 'pad':
                src = invals[0]
                cfg = eqn.params['padding_config']
                if cfg[-1] == (0, 0, 0):
                    prov[out] = get_prov(src)
                else:
                    protect(get_prov(src))
                    prov[out] = BROKEN
                continue

            # anything else: conservatively protect every tensor operand
            for v in invals:
                p = get_prov(v)
                if p is not None and p not in (INPUT,):
                    protect(p)
            for o in eqn.outvars:
                if hasattr(o, 'aval'):
                    prov[o] = BROKEN if any(get_prov(v) is not None
                                            for v in invals) else None

    walk(jaxpr)
    # model outputs (logits): their producer is the head — protected
    for v in jaxpr.outvars:
        graph.protected.update(_producers(prov.get(v)))
    return graph


# ---------------------------------------------------------------------------
# the shrink
# ---------------------------------------------------------------------------

class _UnionFind:
    def __init__(self):
        self.parent = {}

    def find(self, x):
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[ra] = rb


def _get_module(tree: dict, module_path: str) -> Optional[dict]:
    node = tree
    for part in module_path.split('/'):
        if not isinstance(node, dict) or part not in node:
            return None
        node = node[part]
    return node if isinstance(node, dict) else None


def _bn_candidates(module_path: str) -> List[str]:
    """BN module paths that normalize `module_path`'s output (zoo naming)."""
    parts = module_path.split('/')
    name = parts[-1]
    parent = parts[:-1]
    outs = []
    if name.startswith('conv'):
        outs.append('/'.join(parent + ['bn' + name[len('conv'):]]))
    if name.startswith('pw_'):
        outs.append('/'.join(parent + ['bn_' + name[len('pw_'):]]))
    if name in ('dw', 'pw'):
        outs.append('/'.join(parent + ['bn_' + name]))
    return outs


def shrink_residual_aware(params, batch_stats, graph: ConvGraph
                          ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Slice dead channels out of producers AND consumers, residual-aware.

    Returns (packed, manifest).  packed maps param path -> (possibly smaller)
    array covering BOTH the params and batch_stats trees (batch_stats paths
    are prefixed 'batch_stats/').  manifest records each component's kept
    channels, its producer and consumer slices, and the width change.
    """
    params = jax.device_get(params)
    batch_stats = jax.device_get(batch_stats)

    # 1. components over producers (joined through shared sites)
    uf = _UnionFind()
    sites_by_producer: Dict[str, List[ConsumerSite]] = {}
    for site in graph.sites:
        if not site.clean or not site.producers:
            for p in site.producers:
                graph.protected.add(p)
            continue
        plist = sorted(site.producers)
        for p in plist[1:]:
            uf.union(plist[0], p)
        for p in plist:
            sites_by_producer.setdefault(p, []).append(site)

    components: Dict[str, set] = {}
    for p in sites_by_producer:
        components.setdefault(uf.find(p), set()).add(p)

    # depthwise consumers pass identity through: a depthwise site in a
    # component means the dw kernel is sliced WITH the component, and any
    # site reading the dw output already carries the original producers
    # (capture passes provenance through), so no extra bookkeeping here.

    def dead_channels(site: ConsumerSite) -> Optional[np.ndarray]:
        module = _get_module(params, site.consumer)
        if module is None or 'kernel' not in module:
            return None
        k = np.asarray(module['kernel'])
        if site.depthwise:
            norms = np.abs(k).sum(axis=tuple(i for i in range(k.ndim)
                                             if i != 3))
        elif k.ndim == 4:
            norms = np.abs(k).sum(axis=(0, 1, 3))
        elif k.ndim == 2:
            norms = np.abs(k).sum(axis=1)
        else:
            return None
        return norms == 0.0

    manifest: Dict[str, Any] = {'components': [], 'leaf_slices': {},
                                'depthwise': sorted(graph.depthwise)}

    def record_slice(module_path: str, leaf: str, axis: int, comp_idx: int,
                     in_stats: bool = False):
        pstr = ('batch_stats/' if in_stats else '') + module_path + '/' + leaf
        manifest['leaf_slices'].setdefault(pstr, []).append([axis, comp_idx])

    for root, producers in sorted(components.items()):
        if producers & graph.protected:
            continue
        sites = []
        seen = set()
        for p in producers:
            for s in sites_by_producer[p]:
                key = (s.consumer, s.in_dim)
                if key not in seen:
                    seen.add(key)
                    sites.append(s)
        # Intersection of dead sets over the REAL consumer sites (fgc=1
        # convs / dense).  Depthwise sites are transparent pass-throughs:
        # channel liveness is decided by their downstream readers (whose
        # sites carry the same producers via provenance), and the dw kernel
        # is merely SLICED along with the component.
        dead = None
        ok = True
        for s in sites:
            if s.depthwise:
                continue
            d = dead_channels(s)
            if d is None:
                ok = False
                break
            dead = d if dead is None else (dead & d)
        if not ok or dead is None or not dead.any():
            continue
        keep = np.nonzero(~dead)[0]
        nb_orig = int(dead.size)

        # sanity: every producer's output dim matches
        prod_ok = True
        for p in producers:
            module = _get_module(params, p)
            if module is None or 'kernel' not in module:
                prod_ok = False
                break
            if np.asarray(module['kernel']).shape[-1] != nb_orig:
                prod_ok = False
                break
        if not prod_ok:
            continue

        comp_idx = len(manifest['components'])
        comp_record = {'producers': sorted(producers),
                       'consumers': sorted({s.consumer for s in sites}),
                       'kept_channels': keep.tolist(),
                       'orig_channels': nb_orig}

        def slice_bias_and_bn(module_path: str):
            """Slice a module's bias + its BN params/stats to `keep` — shared
            by producers and depthwise consumers (whose in-dim slice IS the
            channel dim, so their per-channel params follow too)."""
            module = _get_module(params, module_path)
            if 'bias' in module:
                module['bias'] = np.asarray(module['bias'])[keep]
                record_slice(module_path, 'bias', 0, comp_idx)
            for bn_path in _bn_candidates(module_path):
                bn_p = _get_module(params, bn_path)
                if bn_p is not None:
                    inner = 'bn' if 'bn' in bn_p else None
                    bn_p = bn_p.get('bn', bn_p)
                    for key in ('scale', 'bias'):
                        if key in bn_p:
                            bn_p[key] = np.asarray(bn_p[key])[keep]
                            record_slice(bn_path + ('/bn' if inner else ''),
                                         key, 0, comp_idx)
                bn_s = _get_module(batch_stats, bn_path)
                if bn_s is not None:
                    inner = 'bn' if 'bn' in bn_s else None
                    bn_s = bn_s.get('bn', bn_s)
                    for key in ('mean', 'var'):
                        if key in bn_s:
                            bn_s[key] = np.asarray(bn_s[key])[keep]
                            record_slice(bn_path + ('/bn' if inner else ''),
                                         key, 0, comp_idx, in_stats=True)

        def slice_output_side(module_path: str):
            """Producer-style slice: kernel out-dim, bias, BN params/stats."""
            module = _get_module(params, module_path)
            k = np.asarray(module['kernel'])
            module['kernel'] = k[..., keep]
            record_slice(module_path, 'kernel', k.ndim - 1, comp_idx)
            slice_bias_and_bn(module_path)

        # producers: kernel out-dim, bias, and their BN params/stats
        for p in sorted(producers):
            slice_output_side(p)
        # consumers: kernel in-dim (depthwise also shrinks its output side)
        for s in sites:
            module = _get_module(params, s.consumer)
            k = np.asarray(module['kernel'])
            module['kernel'] = np.take(k, keep, axis=s.in_dim)
            record_slice(s.consumer, 'kernel', s.in_dim, comp_idx)
            if s.depthwise:
                slice_bias_and_bn(s.consumer)
        manifest['components'].append(comp_record)

    packed = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        packed[masking.path_str(path)] = np.asarray(leaf)
    for path, leaf in jax.tree_util.tree_leaves_with_path(batch_stats):
        packed['batch_stats/' + masking.path_str(path)] = np.asarray(leaf)
    nb = sum(len(c['kept_channels']) for c in manifest['components'])
    log.info('residual-aware shrink: %d components, %d channels kept '
             'of %d originals',
             len(manifest['components']), nb,
             sum(c['orig_channels'] for c in manifest['components']))
    return packed, manifest


def expand_to_dense(packed: Dict[str, Any], manifest: Dict[str, Any],
                    like_params, like_batch_stats):
    """Scatter a shrunk tree back to the original dense shapes (zeros in the
    removed channels) — used by the exact-equality export self-check."""
    import copy
    params = copy.deepcopy(jax.device_get(like_params))
    batch_stats = copy.deepcopy(jax.device_get(like_batch_stats))

    def set_leaf(tree, pstr, value):
        parts = pstr.split('/')
        node = tree
        for part in parts[:-1]:
            node = node[part]
        node[parts[-1]] = value

    def get_shape(tree, pstr):
        parts = pstr.split('/')
        node = tree
        for part in parts:
            node = node[part]
        return np.shape(node)

    leaf_slices = manifest.get('leaf_slices', {})
    for pstr, arr in packed.items():
        tree = batch_stats if pstr.startswith('batch_stats/') else params
        rel = pstr[len('batch_stats/'):] if pstr.startswith('batch_stats/') else pstr
        target_shape = get_shape(tree, rel)
        sub = np.asarray(arr)
        if sub.shape == tuple(target_shape):
            set_leaf(tree, rel, sub)
            continue
        # scatter using the EXACT slices recorded at shrink time
        dense = np.zeros(target_shape, sub.dtype)
        idx: List[Any] = [np.arange(n) for n in target_shape]
        for axis, comp_idx in leaf_slices.get(pstr, []):
            idx[axis] = np.asarray(
                manifest['components'][comp_idx]['kept_channels'])
        dense[np.ix_(*idx)] = sub
        set_leaf(tree, rel, dense)
    return params, batch_stats


# ---------------------------------------------------------------------------
# shrunk-serving construction (the reference export's "alt routines",
# export_chn_pruned_tflite_model.py:223-277: rebuild the graph with SMALLER
# convs and run it)
# ---------------------------------------------------------------------------

def width_map_from_packed(packed: Dict[str, Any],
                          manifest: Optional[Dict[str, Any]] = None,
                          ) -> Dict[str, int]:
    """Per-module output-channel counts of a shrunk packed tree.

    Feed this as the zoo models' ``width_map`` to construct the physically
    smaller serving network (depthwise kernels are skipped — their width
    follows the input automatically).  Pass the shrink ``manifest`` when
    available: it records the ACTUAL depthwise kernel paths from the traced
    graph; without it a shape heuristic (shape[2] == 1) is used, which also
    matches regular convs with a single input channel (grayscale stems, or
    an input dim shrunk to one surviving channel).
    """
    depthwise = set(manifest.get('depthwise', ())) if manifest else None
    wm = {}
    for pstr, arr in packed.items():
        if pstr.startswith('batch_stats/') or not pstr.endswith('/kernel'):
            continue
        arr = np.asarray(arr)
        if arr.ndim != 4:
            continue
        module = pstr[:-len('/kernel')]
        if depthwise is not None:
            if module + '/kernel' in depthwise or module in depthwise:
                continue
        elif arr.shape[2] == 1:
            continue
        wm[module] = int(arr.shape[-1])
    return wm


def variables_from_packed(packed: Dict[str, Any]) -> Dict[str, Any]:
    """Nest a packed path->array dict back into {'params', 'batch_stats'}."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def insert(tree, pstr, value):
        parts = pstr.split('/')
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = np.asarray(value)

    for pstr, arr in packed.items():
        if pstr.startswith('batch_stats/'):
            insert(stats, pstr[len('batch_stats/'):], arr)
        else:
            insert(params, pstr, arr)
    return {'params': params, 'batch_stats': stats}
