"""Fused fake-quantization kernels with straight-through-estimator gradients.

Numerics match /root/reference/learners/uniform_quantization/utils.py:163-306
bit-for-bit in fp32:

    alpha = max(x) - min(x) + 1e-10          (stop-gradient)
    beta  = min(x)                           (stop-gradient)
    k     = 2^bits - 1
    q     = alpha * round((x - beta)/alpha * k)/k + beta

with three scaling granularities:
* per-tensor        (activations & weights without bucketing),
* split buckets     (flatten, pad-with-last to a multiple of bucket_size,
                     reshape [bucket_size, nb_buckets], scale per column),
* channel buckets   (reshape [-1, c_out], scale per output channel).

The reference realizes round-with-STE through TF's C++ Round op plus a
Python-side `gradient_override_map({'Round': 'Identity'})` (utils.py:184-187).
Here the whole min/max -> normalize -> round -> denormalize chain is ONE
`jax.custom_vjp` whose backward is the identity (the derivative the override
produces analytically: d(deq)/dx = alpha * (1/k) * k * (1/alpha) = 1), and the
forward is a fused Pallas VMEM kernel on TPU (single pass over the tensor:
reduction + quantization without an HBM round-trip) with a pure-XLA fallback
for CPU tests / oversized tensors.

Storage accounting for bucket scale factors matches utils.py:297-306:
2 x 32-bit scalars per bucket.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-10
# Per-tensor VMEM budget for the single-block Pallas path (~bytes). The
# kernel holds input + output + fp32 temporaries simultaneously (~4-5x the
# input), so cap inputs at 2 MiB to stay under the 16 MiB VMEM scoped limit;
# bigger tensors fall back to the XLA implementation (still fuses the
# min/max + round chain into a few passes).
_PALLAS_MAX_BYTES = 2 * 1024 * 1024


def _use_pallas() -> bool:
    platform = jax.default_backend()
    return platform in ('tpu', 'axon')


# ---------------------------------------------------------------------------
# Core quantize math (shared by XLA fallback and Pallas kernel bodies)
# ---------------------------------------------------------------------------

def _quantize_math(x, k, axis: Optional[int]):
    """min/max affine quantize along `axis` (None = whole tensor)."""
    x32 = x.astype(jnp.float32)
    w_max = jnp.max(x32, axis=axis, keepdims=axis is not None)
    w_min = jnp.min(x32, axis=axis, keepdims=axis is not None)
    alpha = w_max - w_min + EPS
    beta = w_min
    normalized = (x32 - beta) / alpha
    q = jnp.round(normalized * k) / k
    return alpha * q + beta


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _fq_tensor_kernel(x_ref, k_ref, o_ref):
    k = k_ref[0]
    o_ref[:] = _quantize_math(x_ref[:], k, axis=None).astype(o_ref.dtype)


def _fq_axis0_kernel(x_ref, k_ref, o_ref):
    k = k_ref[0]
    o_ref[:] = _quantize_math(x_ref[:], k, axis=0).astype(o_ref.dtype)


@jax.jit
def _fq_pallas_2d(x2d: jax.Array, k: jax.Array) -> jax.Array:
    """Per-TENSOR fused fake-quant (per-column quantization routes through
    the gridded _fq_pallas_cols_grid instead)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        _fq_tensor_kernel,
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x2d, k.reshape(1))


# column-tile width for the gridded per-column kernel (lane dimension)
_COL_TILE = 128
# max rows a [rows, 128] fp32 block may have: in + out + temps < 16 MiB VMEM
_MAX_GRID_ROWS = 8192


@jax.jit
def _fq_pallas_cols_grid(x2d: jax.Array, k: jax.Array) -> jax.Array:
    """Gridded per-column fake-quant: each program quantizes a [rows, 128]
    column stripe (column scales are independent, so the grid tiles the
    column axis and every stripe is one fused min/max->round pass in VMEM).
    Handles tensors far beyond the single-block VMEM budget."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, cols = x2d.shape
    grid = (pl.cdiv(cols, _COL_TILE),)
    return pl.pallas_call(
        _fq_axis0_kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        in_specs=[
            pl.BlockSpec((rows, _COL_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, _COL_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(x2d, k.reshape(1))


def _per_column_quant(cols2d: jax.Array, k) -> jax.Array:
    """Route per-column quantization: gridded Pallas kernel when the stripe
    fits VMEM and rows align to the fp32 sublane tile, else fused XLA."""
    rows = cols2d.shape[0]
    if (_use_pallas() and rows % 8 == 0 and rows <= _MAX_GRID_ROWS
            and cols2d.size >= 1024):
        return _fq_pallas_cols_grid(cols2d, jnp.asarray(k, jnp.float32))
    return _quantize_math(cols2d, k, 0)


def _pad_to_2d(x: jax.Array) -> Tuple[jax.Array, Tuple[int, int]]:
    """Flatten to [rows, 128] padded with the first element (value-neutral for
    min/max only when padding with an existing element — we use x[0])."""
    flat = x.reshape(-1)
    n = flat.shape[0]
    cols = 128
    rows = -(-n // cols)
    pad = rows * cols - n
    flat = jnp.concatenate([flat, jnp.broadcast_to(flat[0], (pad,))]) if pad else flat
    return flat.reshape(rows, cols), (n, pad)


# ---------------------------------------------------------------------------
# Public ops (each with custom_vjp STE)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def fake_quant(x: jax.Array, bits: jax.Array) -> jax.Array:
    """Per-tensor fake-quantization with STE."""
    k = (jnp.exp2(bits.astype(jnp.float32)) - 1.0)
    if _use_pallas() and x.size * 4 <= _PALLAS_MAX_BYTES and x.size >= 1024:
        x2d, (n, pad) = _pad_to_2d(x)
        out = _fq_pallas_2d(x2d, k)
        return out.reshape(-1)[:n].reshape(x.shape).astype(x.dtype)
    return _quantize_math(x, k, None).astype(x.dtype)


def _fake_quant_fwd(x, bits):
    return fake_quant(x, bits), None


def _fake_quant_bwd(_, g):
    return g, None


fake_quant.defvjp(_fake_quant_fwd, _fake_quant_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fake_quant_split_bucket(x: jax.Array, bits: jax.Array, bucket_size: int) -> jax.Array:
    """Split-bucket fake-quantization (utils.py:247-276): flatten, pad with the
    LAST element to a multiple of bucket_size, scale per bucket."""
    k = (jnp.exp2(bits.astype(jnp.float32)) - 1.0)
    flat = x.reshape(-1)
    n = flat.shape[0]
    nb_buckets = -(-n // bucket_size)
    pad = nb_buckets * bucket_size - n
    if pad:
        flat = jnp.concatenate([flat, jnp.broadcast_to(flat[-1], (pad,))])
    # row-major [bucket_size, nb_buckets] — same layout as tf.reshape, so
    # bucket j collects the elements with index % nb_buckets == j
    cols = flat.reshape(bucket_size, nb_buckets)
    out = _per_column_quant(cols, k)
    out = out.reshape(-1)
    if pad:
        out = out[:-pad]
    return out.reshape(x.shape).astype(x.dtype)


def _fqsb_fwd(x, bits, bucket_size):
    return fake_quant_split_bucket(x, bits, bucket_size), None


def _fqsb_bwd(bucket_size, _, g):
    return g, None


fake_quant_split_bucket.defvjp(_fqsb_fwd, _fqsb_bwd)


@jax.custom_vjp
def fake_quant_channel_bucket(x: jax.Array, bits: jax.Array) -> jax.Array:
    """Per-output-channel fake-quantization (utils.py:278-290): reshape
    [-1, c_out], scale per column. For conv kernels HWIO the last axis is c_out;
    for dense kernels [c_in, c_out] likewise."""
    k = (jnp.exp2(bits.astype(jnp.float32)) - 1.0)
    cout = x.shape[-1]
    cols = x.reshape(-1, cout)
    out = _per_column_quant(cols, k)
    return out.reshape(x.shape).astype(x.dtype)


def _fqcb_fwd(x, bits):
    return fake_quant_channel_bucket(x, bits), None


def _fqcb_bwd(_, g):
    return g, None


fake_quant_channel_bucket.defvjp(_fqcb_fwd, _fqcb_bwd)


def _nudged_range(range_min, range_max, bits):
    """TF FakeQuantWithMinMaxVars' zero-point nudge: shift (min, max) so the
    ZERO POINT lands exactly on the integer grid.  Without it, 0.0 is not
    representable (an EMA range like [0.02, 6.1] quantizes zeros to 0.02)
    and integer deployment — whose zero point IS an integer — cannot
    reproduce the QAT grid."""
    k = jnp.exp2(bits.astype(jnp.float32)) - 1.0
    scale = (range_max - range_min).astype(jnp.float32) / k + EPS
    zero_point = jnp.round(jnp.clip(-range_min.astype(jnp.float32) / scale,
                                    0.0, k))
    nudged_min = -zero_point * scale
    nudged_max = (k - zero_point) * scale
    return nudged_min, nudged_max, scale


@jax.custom_vjp
def fake_quant_with_range(x: jax.Array, range_min: jax.Array,
                          range_max: jax.Array, bits: jax.Array) -> jax.Array:
    """Fake-quantize with an EXTERNALLY tracked range (moving-average min/max),
    the semantics of tf.contrib.quantize's MovingAvgQuantize used by the
    uniform-tf learner (/root/reference/learners/uniform_quantization_tf/
    learner.py:177-187), INCLUDING the zero-point nudge of
    FakeQuantWithMinMaxVars.  STE passes gradients only inside the nudged
    range (clipped positions get zero gradient, like TF)."""
    nmin, nmax, scale = _nudged_range(range_min, range_max, bits)
    x32 = x.astype(jnp.float32)
    clipped = jnp.clip(x32, nmin, nmax)
    q = jnp.round((clipped - nmin) / scale)
    return (q * scale + nmin).astype(x.dtype)


def _fqwr_fwd(x, range_min, range_max, bits):
    out = fake_quant_with_range(x, range_min, range_max, bits)
    nmin, nmax, _ = _nudged_range(range_min, range_max, bits)
    in_range = jnp.logical_and(x >= nmin, x <= nmax)
    return out, in_range


def _fqwr_bwd(in_range, g):
    return g * in_range.astype(g.dtype), None, None, None


fake_quant_with_range.defvjp(_fqwr_fwd, _fqwr_bwd)


# ---------------------------------------------------------------------------
# Storage accounting (utils.py:297-306)
# ---------------------------------------------------------------------------

def bucket_storage_bits(shape: Tuple[int, ...], bucket_type: str, bucket_size: int) -> int:
    """Extra bits for per-bucket (alpha, beta) fp32 pairs."""
    n = int(np.prod(shape))
    if bucket_type == 'split':
        nb_buckets = -(-n // bucket_size)
    elif bucket_type == 'channel':
        nb_buckets = shape[-1]
    else:
        raise ValueError('unrecognized bucket type: ' + bucket_type)
    return nb_buckets * 32 * 2


def quantized_model_bits(shapes, w_bits, bucket_type: Optional[str], bucket_size: int) -> int:
    """Total storage bits for quantized weights incl. bucket overhead."""
    total = 0
    for shape, bits in zip(shapes, w_bits):
        total += int(np.prod(shape)) * int(bits)
        if bucket_type:
            total += bucket_storage_bits(shape, bucket_type, bucket_size)
    return total
