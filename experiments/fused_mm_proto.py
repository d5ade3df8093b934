"""Prototype: Pallas fused 1x1-conv (matmul) with BN prologue/epilogue.

Compares, on one representative ResNet-50 shape:
  A) XLA chain:  z = relu(x*scale+shift);  y = z @ W;  stats = sum/sumsq(y)
  B) Pallas fused kernel doing all of A in ONE pass over x.

Traffic model: A moves ~5 passes of the big tensor, B moves 2 (read x,
write y) -> expect ~2.5x on this op if bandwidth-bound.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = int(os.environ.get('M', 256 * 56 * 56))   # rows = N*H*W
K = int(os.environ.get('K', 256))             # in channels
N = int(os.environ.get('N', 64))              # out channels
TILE_M = 1024


def xla_chain(x, w, scale, shift):
    z = jax.nn.relu(x * scale + shift)
    y = jax.lax.dot_general(z, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.bfloat16)
    s = jnp.sum(y.astype(jnp.float32), axis=0)
    ss = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=0)
    return y, s, ss


def fused_kernel(x_ref, w_ref, scale_ref, shift_ref, y_ref, s_ref, ss_ref):
    i = pl.program_id(0)
    z = jax.nn.relu(x_ref[:].astype(jnp.float32)
                    * scale_ref[:] + shift_ref[:]).astype(jnp.bfloat16)
    y = jnp.dot(z, w_ref[:], preferred_element_type=jnp.float32)
    y_ref[:] = y.astype(jnp.bfloat16)

    @pl.when(i == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        ss_ref[:] = jnp.zeros_like(ss_ref)

    s_ref[:] += jnp.sum(y, axis=0, keepdims=True)
    ss_ref[:] += jnp.sum(jnp.square(y), axis=0, keepdims=True)


@jax.jit
def pallas_fused(x, w, scale, shift):
    grid = (M // TILE_M,)
    y, s, ss = pl.pallas_call(
        fused_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_M, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
        ],
    )(x, w, scale, shift)
    return y, s[0], ss[0]


def timed(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # tiny transfer to truly sync through the tunnel
    float(jax.device_get(jnp.sum(out[1])))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jax.device_get(jnp.sum(out[1])))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (M, K), jnp.bfloat16)
    w = jax.random.normal(kw, (K, N), jnp.bfloat16) * 0.05
    scale = jnp.ones((1, K), jnp.float32) * 1.1
    shift = jnp.zeros((1, K), jnp.float32) + 0.1

    xla = jax.jit(functools.partial(xla_chain))
    ya, sa, ssa = jax.block_until_ready(xla(x, w, scale, shift))
    yb, sb, ssb = jax.block_until_ready(pallas_fused(x, w, scale, shift))
    err = float(jnp.max(jnp.abs(sa - sb)) / (jnp.max(jnp.abs(sa)) + 1e-9))
    print('rel err on sums: %.2e' % err)
    np.testing.assert_allclose(np.asarray(ya, np.float32),
                               np.asarray(yb, np.float32), rtol=0.1, atol=0.5)

    t_a = timed(xla, x, w, scale, shift)
    t_b = timed(pallas_fused, x, w, scale, shift)
    bytes_min = (M * K + M * N) * 2
    print('XLA chain   : %7.3f ms  (%.0f GB/s effective vs %d MB min)'
          % (t_a, bytes_min / t_a / 1e6, bytes_min // 2**20))
    print('Pallas fused: %7.3f ms  (%.0f GB/s effective)'
          % (t_b, bytes_min / t_b / 1e6))
    print('speedup: %.2fx' % (t_a / t_b))


if __name__ == '__main__':
    main()
