"""True-int8 serving: symmetric quantization + int8 MXU contractions.

The reference's deployment story is TFLite int8 on phones with 2.2-3.7x
latency gains (docs/docs/performance.md:41-48).  The TPU-native analogue is
executing convs/matmuls on the MXU in int8 (v5e int8 peak is 2x bf16):

    xq = round(x / sx)  in int8,  wq = round(w / sw_c)  in int8 (per out-chan)
    y  = conv(xq, wq -> int32) * sx * sw_c

Weights quantize offline (symmetric per-output-channel, 127 levels);
activation scales come from a calibration pass recording per-layer absmax
over a few batches (the PTQ recipe TFLite uses).  `Int8ServingPolicy` plugs
these into the normal model via the `run_contraction` hook — zero model
changes, the same Flax module serves fp32, bf16, or int8.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pocketflow_tpu.nn.layers import CompressionPolicy, compression


def quantize_weights_symmetric(kernel: jax.Array):
    """Per-output-channel symmetric int8: returns (codes int8, scale [c_out])."""
    k32 = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(k32.reshape(-1, k32.shape[-1])), axis=0)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    codes = jnp.clip(jnp.round(k32 / scale), -127, 127).astype(jnp.int8)
    return codes, scale


def int8_contract(x: jax.Array, codes: jax.Array, w_scale: jax.Array,
                  x_scale: jax.Array, contract_fn) -> jax.Array:
    """Quantize x, contract in int8 -> int32 on the MXU, rescale to fp32."""
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale), -127, 127
                  ).astype(jnp.int8)
    acc = contract_fn(xq, codes, jnp.int32)
    return acc.astype(jnp.float32) * (x_scale * w_scale)


class CalibrationPolicy(CompressionPolicy):
    """Records per-layer input absmax for activation scales (PTQ calibration)."""

    def __init__(self):
        self.absmax: Dict[str, jax.Array] = {}

    def reset_trace(self):
        # per-trace accumulator: carrying tracers across jit traces (e.g. a
        # differently-shaped final calibration batch) leaks them; the host
        # loop in calibrate() maxes across batches instead
        super().reset_trace()
        self.absmax = {}

    def process_input(self, path, x):
        m = jnp.max(jnp.abs(x.astype(jnp.float32)))
        self.absmax[path] = jnp.maximum(self.absmax.get(path, 0.0), m)
        return x


def calibrate(model, variables, batches_images) -> Dict[str, float]:
    """Run a few batches, return per-layer input absmax (host floats)."""
    policy = CalibrationPolicy()

    @jax.jit
    def fwd(v, x):
        with compression(policy):
            model.apply(v, x, train=False)
        return dict(policy.absmax)

    scales: Dict[str, float] = {}
    for images in batches_images:
        out = jax.device_get(fwd(variables, images))
        for path, m in out.items():
            scales[path] = max(scales.get(path, 0.0), float(m))
    return {p: max(m, 1e-8) / 127.0 for p, m in scales.items()}


class Int8ServingPolicy(CompressionPolicy):
    """Executes every quantized conv/dense in int8 on the MXU.

    `weight_q[path] = (codes, w_scale)`; `act_scales[path]` from calibrate().
    Layers without entries fall through to the normal bf16/fp32 path.

    `skip_depthwise` (default True): depthwise convs never touch the MXU —
    they run on the VPU where int8 buys nothing, so the quantize/dequantize
    chain around them is pure overhead (this is what capped MobileNet int8
    serving at 0.98x of bf16).  A depthwise site is recognized at trace time
    by its grouped-kernel signature: HWIO weights with I == 1 whose output
    channel count is a multiple of the input's channel count (channel
    multiplier >= 1).
    """

    def __init__(self, weight_q, act_scales: Dict[str, float],
                 skip_depthwise: bool = True):
        self.weight_q = weight_q
        self.act_scales = act_scales
        self.skip_depthwise = skip_depthwise

    def run_contraction(self, path, x, kernel, contract_fn):
        entry = self.weight_q.get(path)
        if entry is None or path not in self.act_scales:
            return None
        if (self.skip_depthwise and kernel.ndim == 4
                and kernel.shape[-2] == 1 and kernel.shape[-1] > 1
                and x.shape[-1] > 1
                and kernel.shape[-1] % x.shape[-1] == 0):
            # depthwise (any channel multiplier: O = C * mult, I == 1):
            # stay on the bf16 VPU path (ADVICE r4 — multiplier > 1 sites
            # pay the same quantize/dequantize overhead as multiplier 1).
            # x.shape[-1] > 1 keeps grayscale-stem DENSE convs (C == 1,
            # mathematically indistinguishable from depthwise) on int8.
            return None
        codes, w_scale = entry
        return int8_contract(x, codes, w_scale,
                             jnp.float32(self.act_scales[path]), contract_fn)


def verify_quant_coverage(model, variables, sample_images,
                          weight_q, act_scales) -> Dict[str, list]:
    """Check every conv/dense contraction has int8 weights + an act scale.

    The reference achieves this with an iterative TFLite-export probe loop
    (uniform_quantization_tf/utils.py:226-295: parse toco's error text, patch
    MovingAvgQuantize nodes, retry); here it is a direct structural check of
    the trace.  Returns {'unquantized_weights': [...], 'uncalibrated': [...]}
    — both empty when the deployment is fully int8."""
    from pocketflow_tpu.learners.capture import CapturePolicy

    class SiteRecorder(CapturePolicy):
        def __init__(self):
            super().__init__()
            self.sites = []

        def process_weight(self, path, kernel):
            self.sites.append(path)
            return kernel

    recorder = SiteRecorder()

    def fwd(v, x):
        with compression(recorder):
            model.apply(v, x, train=False)
        return ()

    jax.eval_shape(fwd, variables,
                   jax.ShapeDtypeStruct(sample_images.shape, jnp.float32))
    missing_w = [p for p in recorder.sites if p not in weight_q]
    missing_a = [p for p in recorder.sites if p not in act_scales]
    return {'unquantized_weights': missing_w, 'uncalibrated': missing_a}


def quantize_model_weights(params, skip_paths=()):
    """Quantize every conv/dense kernel (except skip_paths) for serving.

    Returns {module_path: (codes, w_scale)}."""
    from pocketflow_tpu.learners.weight_sparsification.masking import (
        is_maskable_path, path_str)
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        pstr = path_str(path)
        if not pstr.endswith('/kernel'):
            continue
        module = pstr[:-len('/kernel')]
        if module in skip_paths:
            continue
        out[module] = quantize_weights_symmetric(leaf)
    return out
