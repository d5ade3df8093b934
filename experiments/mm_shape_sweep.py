"""Interleaved XLA-vs-Pallas matmul sweep over ResNet-50's 1x1-conv shapes.

The round-2 roofline work left one open question (docs/performance.md): a
Pallas matmul at tile_m=1024 beat XLA at wide outputs in one session but the
chip's session-to-session variance is large.  This sweep interleaves the two
implementations ABAB within one session, 5 rounds x 8 reps per shape, and
reports medians — the decision evidence for whether a Pallas 1x1-conv path
in the train step is worth building.

Shapes: the bottleneck 1x1 convs of ResNet-50 @ 224, batch 256 (rows =
N*H*W at that stage).

Run on the chip: python experiments/mm_shape_sweep.py

RESULT (2026-08-16, two sessions, interleaved medians, tile_m=1024):
pallas/xla speedup by shape = 0.91/0.88 (stage1), 1.00/0.95 (stage2),
1.09/1.26 (stage3), 0.85/1.18 (stage4) — scattered around 1.0 with no
consistent Pallas win at the model's actual shapes; the earlier isolated
N=128/256 wins do not generalize.  DECISION: the Pallas 1x1-conv
train-step path is not worth building; XLA's conv kernels stay.
(Timings are dispatch-overhead-inflated by the tunnel, but the A/B
comparison is like-for-like.)
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (M, K, N): rows, in-channels, out-channels of RN50 bs-256 1x1 convs
SHAPES = [
    (256 * 56 * 56, 64, 256),     # stage1 expand
    (256 * 56 * 56, 256, 64),     # stage1 reduce
    (256 * 28 * 28, 128, 512),    # stage2 expand
    (256 * 28 * 28, 512, 128),    # stage2 reduce
    (256 * 14 * 14, 256, 1024),   # stage3 expand
    (256 * 14 * 14, 1024, 256),   # stage3 reduce
    (256 * 7 * 7, 512, 2048),     # stage4 expand
    (256 * 7 * 7, 2048, 512),     # stage4 reduce
]
TILE_M = int(os.environ.get('TILE_M', '1024'))


def make_xla(M, K, N):
    def f(x, w):
        return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.bfloat16)
    return jax.jit(f)


def make_pallas(M, K, N):
    def kernel(x_ref, w_ref, y_ref):
        y_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                           preferred_element_type=jnp.float32) \
            .astype(jnp.bfloat16)

    tile = min(TILE_M, M)
    # fit input block + weights + output block + f32 accum in the 16 MiB
    # scoped VMEM limit (with headroom for double buffering), and the grid
    # must tile M exactly
    while tile > 256 and (tile * K + K * N + tile * N) * 2 + tile * N * 4 \
            > 8 * 2 ** 20:
        tile //= 2
    while M % tile:
        tile //= 2

    @jax.jit
    def f(x, w):
        return pl.pallas_call(
            kernel,
            grid=(M // tile,),
            in_specs=[
                pl.BlockSpec((tile, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        )(x, w)
    return f


def time_fn(fn, x, w, reps=8):
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(x, w)
    float(jax.device_get(out[0, 0]))  # true sync through the tunnel
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    key = jax.random.PRNGKey(0)
    print('tile_m =', TILE_M)
    for M, K, N in SHAPES:
        kx, kw = jax.random.split(jax.random.fold_in(key, M + K + N))
        x = jax.random.normal(kx, (M, K), jnp.bfloat16)
        w = jax.random.normal(kw, (K, N), jnp.bfloat16) * 0.05
        fa, fb = make_xla(M, K, N), make_pallas(M, K, N)
        # compile + warm both before interleaved timing
        jax.block_until_ready(fa(x, w)); jax.block_until_ready(fb(x, w))
        ta, tb = [], []
        for _ in range(5):
            ta.append(time_fn(fa, x, w))
            tb.append(time_fn(fb, x, w))
        ma, mb = statistics.median(ta), statistics.median(tb)
        gb = (M * K + M * N + K * N) * 2 / 1e9
        print('M=%8d K=%4d N=%4d | xla %7.3f ms (%3.0f GB/s) | '
              'pallas %7.3f ms (%3.0f GB/s) | pallas/xla %.2fx'
              % (M, K, N, ma, gb / ma * 1e3, mb, gb / mb * 1e3, ma / mb),
              flush=True)


if __name__ == '__main__':
    main()
