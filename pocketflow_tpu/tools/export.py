"""Compressed-model export: the deployment path.

Rebuild of /root/reference/tools/conversion/export_pb_tflite_models.py:17-392
and export_chn_pruned_tflite_model.py / export_quant_tflite_model.py.  The
reference freezes TF graphs and drives toco to TFLite; the TPU-native
deployment artifact is a **packed checkpoint** (msgpack/npz) plus an optional
StableHLO module (via jax.export) that any XLA-backed runtime can load:

* channel-pruned models: kernels are PHYSICALLY shrunk — zeroed input
  channels are removed and the surviving channel indices recorded, so the
  serving model runs the small convs (the reference's "alt routines",
  export_chn_pruned_tflite_model.py:223-277);
* quantized models: weights are stored as int8/int4 codes + per-bucket
  (alpha, beta) fp32 scales — the storage the bit accounting promises
  (uniform_quantization/utils.py:297-306);
* every export runs a numeric self-check against the in-memory model
  (reference export_chn_pruned_tflite_model.py:110-168 checks pb vs tflite).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pocketflow_tpu.core.metrics import get_logger
from pocketflow_tpu.learners.weight_sparsification import masking

log = get_logger()


# ---------------------------------------------------------------------------
# channel-pruned export: physical kernel shrinking
# ---------------------------------------------------------------------------

def shrink_channel_pruned(params) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Remove all-zero input channels from conv kernels.

    Returns (packed, manifest): packed maps param path -> shrunk array;
    manifest records surviving channel indices per shrunk kernel so a serving
    runtime can gather the producer's channels accordingly.
    """
    packed, manifest = {}, {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        pstr = masking.path_str(path)
        arr = np.asarray(jax.device_get(leaf))
        if masking.is_maskable_path(path) and arr.ndim == 4 and arr.shape[2] > 1:
            norms = np.abs(arr).sum(axis=(0, 1, 3))
            keep = np.nonzero(norms > 0)[0]
            if keep.size < arr.shape[2]:
                arr = arr[:, :, keep, :]
                manifest[pstr] = {'kept_in_channels': keep.tolist(),
                                  'orig_in_channels': int(norms.size)}
        packed[pstr] = arr
    return packed, manifest


# ---------------------------------------------------------------------------
# batch-norm folding (the TFLite-converter step the reference relies on)
# ---------------------------------------------------------------------------

def fold_batch_norm(params, batch_stats, epsilon: float = 1e-5):
    """Fold inference-mode BN into the preceding conv/dense kernels.

    W' = W * gamma / sqrt(var + eps) (per output channel);
    b' = beta - mean * gamma / sqrt(var + eps) (+ folded old bias).
    BN params collapse to identity so the same model definition serves the
    folded checkpoint unchanged.  Pairing is by the zoo naming convention:
    'convX'<->'bnX', 'conv_init'<->'bn_init', 'dw'<->'bn_dw', 'pw'<->'bn_pw',
    'pw_expand'<->'bn_expand', 'pw_project'<->'bn_project', 'pw_head'<->'bn_head'.

    Returns (params, batch_stats) as new host trees.
    """
    import copy
    params = copy.deepcopy(jax.device_get(params))
    batch_stats = copy.deepcopy(jax.device_get(batch_stats))

    def bn_name_for(conv_name: str):
        if conv_name.startswith('conv'):
            return 'bn' + conv_name[len('conv'):]
        if conv_name.startswith('pw_'):
            return 'bn_' + conv_name[len('pw_'):]
        if conv_name in ('dw', 'pw'):
            return 'bn_' + conv_name
        return None

    def walk(pnode, snode):
        if not isinstance(pnode, dict):
            return
        for name in list(pnode.keys()):
            child = pnode[name]
            if not isinstance(child, dict):
                continue
            bn_name = bn_name_for(name)
            if ('kernel' in child and bn_name and bn_name in pnode
                    and isinstance(snode, dict) and bn_name in snode):
                bn_p = pnode[bn_name].get('bn', pnode[bn_name])
                bn_s = snode[bn_name].get('bn', snode[bn_name])
                gamma = np.asarray(bn_p.get('scale', 1.0), np.float32)
                beta = np.asarray(bn_p.get('bias', 0.0), np.float32)
                mean = np.asarray(bn_s['mean'], np.float32)
                var = np.asarray(bn_s['var'], np.float32)
                factor = gamma / np.sqrt(var + epsilon)
                kernel = np.asarray(child['kernel'], np.float32)
                # BN_eval(conv(x;W)+b) == conv(x;W*f) + beta + (b-mean)*f:
                # the scale folds into the kernel, the shift into BN's beta
                # (our convs are bias-free, so BN keeps carrying the shift —
                # same model definition serves the folded checkpoint)
                child['kernel'] = (kernel * factor).astype(kernel.dtype)
                old_bias = np.asarray(child.get('bias', 0.0), np.float32)
                if 'bias' in child:
                    child['bias'] = np.zeros_like(old_bias)
                if 'bias' in bn_p:
                    bn_p['bias'] = (beta + (old_bias - mean) * factor
                                    ).astype(np.float32)
                if 'scale' in bn_p:
                    bn_p['scale'] = np.ones_like(gamma)
                bn_s['mean'] = np.zeros_like(mean)
                # var' = 1 - eps so the residual BN's 1/sqrt(var'+eps) == 1
                bn_s['var'] = np.full_like(var, 1.0 - epsilon)
            walk(child, snode.get(name, {}) if isinstance(snode, dict) else {})

    walk(params, batch_stats)
    return params, batch_stats


# ---------------------------------------------------------------------------
# quantized export: integer packing
# ---------------------------------------------------------------------------

def pack_quantized(params, weight_paths, w_bit_list,
                   bucket_type: Optional[str] = None,
                   bucket_size: int = 256) -> Dict[str, Any]:
    """Store quantized kernels as integer codes + (alpha, beta) scales."""
    packed = {}
    bits_of = dict(zip(weight_paths, w_bit_list))
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        pstr = masking.path_str(path)
        arr = np.asarray(jax.device_get(leaf), np.float32)
        module = pstr[:-len('/kernel')] if pstr.endswith('/kernel') else None
        if module in bits_of and bits_of[module] < 32:
            bits = int(bits_of[module])
            k = 2 ** bits - 1
            if bucket_type == 'channel':
                cols = arr.reshape(-1, arr.shape[-1])
            elif bucket_type == 'split':
                flat = arr.reshape(-1)
                nb = -(-flat.size // bucket_size)
                pad = nb * bucket_size - flat.size
                flat = np.concatenate([flat, np.repeat(flat[-1:], pad)])
                cols = flat.reshape(bucket_size, nb)
            else:
                cols = arr.reshape(-1, 1)
            w_min = cols.min(axis=0)
            alpha = cols.max(axis=0) - w_min + 1e-10
            codes = np.round((cols - w_min) / alpha * k)
            dtype = np.uint8 if bits <= 8 else np.uint16
            packed[pstr] = {'codes': codes.astype(dtype), 'alpha': alpha,
                            'beta': w_min, 'bits': bits,
                            'shape': arr.shape, 'bucket_type': bucket_type,
                            'bucket_size': bucket_size}
        else:
            packed[pstr] = arr
    return packed


def unpack_quantized(packed: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Dequantize a packed dict back to fp32 arrays (serving-side load)."""
    out = {}
    for pstr, item in packed.items():
        if isinstance(item, dict) and 'codes' in item:
            k = 2 ** item['bits'] - 1
            cols = item['codes'].astype(np.float32) / k * item['alpha'] + item['beta']
            n = int(np.prod(item['shape']))
            out[pstr] = cols.reshape(-1)[:n].reshape(item['shape']) \
                if item['bucket_type'] == 'split' else cols.reshape(item['shape'])
        else:
            out[pstr] = item
    return out


# ---------------------------------------------------------------------------
# serving module export + self-check
# ---------------------------------------------------------------------------

def export_stablehlo(model, variables, sample_images, out_path: str) -> Optional[str]:
    """Serialize the eval forward as a StableHLO module (jax.export); the
    TPU-native analogue of the frozen .pb (reference :255-261)."""
    try:
        from jax import export as jax_export
    except ImportError:
        log.warning('jax.export unavailable; skipping StableHLO export')
        return None
    fn = lambda v, x: model.apply(v, x, train=False)
    exported = jax_export.export(jax.jit(fn))(
        jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables),
        jax.ShapeDtypeStruct(sample_images.shape, jnp.float32))
    blob = exported.serialize()
    os.makedirs(os.path.dirname(out_path) or '.', exist_ok=True)
    with open(out_path, 'wb') as fout:
        fout.write(blob)
    log.info('StableHLO module written to %s (%d bytes)', out_path, len(blob))
    return out_path


def numeric_self_check(model, variables, restored_variables, sample_images,
                       atol: float = 1e-3) -> float:
    """Max |logits delta| between original and exported-then-restored params
    (reference export_chn_pruned_tflite_model.py:110-168)."""
    fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    a = np.asarray(jax.device_get(fn(variables, sample_images)))
    b = np.asarray(jax.device_get(fn(restored_variables, sample_images)))
    delta = float(np.max(np.abs(a - b)))
    log.info('export self-check: max |logits delta| = %.3e', delta)
    return delta


def save_packed(packed: Dict[str, Any], manifest: Dict[str, Any],
                out_path: str) -> str:
    """Serialize a packed dict to .npz + a JSON manifest.

    Quantized entries (dicts with codes/alpha/beta) flatten to
    '<path>#codes' / '#alpha' / '#beta' arrays with their metadata recorded
    in the manifest, so `load_packed` reconstructs them losslessly."""
    os.makedirs(os.path.dirname(out_path) or '.', exist_ok=True)
    arrays, manifest = {}, dict(manifest)
    qmeta = {}
    for key, value in packed.items():
        flat_key = key.replace('/', '__')
        if isinstance(value, dict) and 'codes' in value:
            arrays[flat_key + '#codes'] = value['codes']
            arrays[flat_key + '#alpha'] = value['alpha']
            arrays[flat_key + '#beta'] = value['beta']
            qmeta[key] = {'bits': value['bits'], 'shape': list(value['shape']),
                          'bucket_type': value['bucket_type'],
                          'bucket_size': value['bucket_size']}
        else:
            arrays[flat_key] = value
    if qmeta:
        manifest['quantized'] = qmeta
    np.savez_compressed(out_path, **arrays)
    with open(out_path + '.manifest.json', 'w') as fout:
        json.dump(manifest, fout, indent=2, default=str)
    return out_path


def load_packed(out_path: str) -> Dict[str, Any]:
    """Inverse of save_packed: returns the packed dict."""
    blob = np.load(out_path if out_path.endswith('.npz') else out_path + '.npz')
    with open((out_path if out_path.endswith('.npz') else out_path + '.npz')
              + '.manifest.json') as fin:
        manifest = json.load(fin)
    qmeta = manifest.get('quantized', {})
    packed = {}
    for flat_key in blob.files:
        key = flat_key.split('#')[0].replace('__', '/')
        if '#' in flat_key:
            item = packed.setdefault(key, dict(qmeta[key]))
            item['shape'] = tuple(item['shape'])
            item[flat_key.split('#')[1]] = blob[flat_key]
        else:
            packed[key] = blob[flat_key]
    return packed
