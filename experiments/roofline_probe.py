"""Per-access-pattern HBM roofline probes (round 5).

Round 2's ceiling table (docs/performance.md "The roofline, corrected") was
measured with one jitted op per dispatch; on the tunneled backend that
protocol is dispatch-overhead-limited (~1.4 ms/call), so its 355-400 GB/s
"practical ceiling" under-read the chip.  bench.py's rewritten probe (32
copy-adds chained through a lax.scan inside ONE jit dispatch) reads
443 GB/s on the same chip — which drops the train step's
achieved-fraction-of-ceiling from ~90% to ~79% and reopens the question
VERDICT r4 weak #7 asked: is the step roofline-bound or is there headroom?

A single 1-D contiguous copy-add is NOT the right ceiling for a conv train
step, whose traffic is 4-D activations walked by convolutions, BN-stats
reductions, and optimizer sweeps.  This probe measures the same-session
streaming rate of each access pattern the step actually performs, every one
with the scan-inside-jit protocol (traffic per dispatch >= 8 GB):

  copy1d    - 1-D bf16 copy-add (bench.py's probe; the absolute ceiling)
  copy4d    - NHWC bf16 copy-add at the RN50 bottleneck activation shape
  bnstats   - read-only sum+sumsq reduction over NHWC (the BN stats pass)
  conv1x1   - 1x1 conv C->C at the dominant RN50 shape (MXU op, HBM-bound)
  conv3x3   - 3x3 conv at the stage-3 shape
  fakequant - the QAT fake-quant chain (minmax + scale + round + dequant)
  optimizer - fp32 momentum-SGD param sweep (read p,m,g; write p,m)

Effective GB/s = bytes-touched / time.  The comparable ceiling for the
train step is the traffic-weighted mix of these, not copy1d.

Run on the chip:  python experiments/roofline_probe.py [--publish]
Writes results/roofline_probe.json (publish) or /tmp copy otherwise.

RESULT (2026-08-19, on-chip, results/roofline_probe.json):
    copy1d 480 | copy4d 500 | bnstats 459 | conv1x1 249 | conv3x3 104
    fakequant 335 GB/s | matmul8k 152.7 TFLOP/s  (optimizer 972 — see below)
Readings: streaming is ~480-500 GB/s (round 2's 355-400 "practical
ceiling" was dispatch-overhead-limited); the fake-quant chain confirms one
extra full read pass (335 = 2/3 x 500, i.e. 2r+1w vs the counted 1r+1w);
conv3x3 at 104 GB/s effective is COMPUTE-bound and healthy (237 GFLOP per
iteration -> 118 TFLOP/s = 77% of the same-session 152.7 TFLOP/s big-matmul
rate); conv1x1 at 249 GB/s is the chip's envelope for low-intensity
matmuls — NOT a lowering artifact (conv1x1_ab.py: XLA conv == XLA dot ==
hand-tiled Pallas within +/-5% at every trunk width).  CAVEAT: the
optimizer probe reads ABOVE the copy ceiling (972 GB/s > any plausible HBM
rate for 5 fp32 streams), meaning XLA elides part of the counted traffic
across scan iterations for that purely-elementwise recurrence; treat it as
an upper bound only — it carries no sanity floor and the step's optimizer
traffic (~0.5 GB/step) is too small to matter either way.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'results', 'roofline_probe.json')

N_TIMED = 4

# Sanity bands for the committed artifact (test_evidence_integrity.py).
# Deliberately wide: the shared chip's session-to-session variance is
# 0.7-1.1x (docs/performance.md).  They exist to catch a broken probe or a
# silently degraded chip allocation, not to pin exact rates.
LOCKED_MIN = {
    'copy1d_gb_s': 300.0,
    'copy4d_gb_s': 300.0,
    'bnstats_gb_s': 250.0,
    'conv1x1_gb_s': 140.0,
    'conv3x3_gb_s': 60.0,
    'fakequant_gb_s': 180.0,
    'matmul8k_tflop_s': 100.0,
}


def check_results(results):
    violations = []
    for key, floor in LOCKED_MIN.items():
        val = results.get(key)
        if val is None:
            violations.append('%s missing from results' % key)
        elif val < floor:
            violations.append('%s = %.1f below sanity floor %.1f'
                              % (key, val, floor))
    # internal consistency: a fused elementwise chain cannot beat a copy
    fq_rate, cp_rate = results.get('fakequant_gb_s'), results.get('copy4d_gb_s')
    if fq_rate and cp_rate and fq_rate > cp_rate * 1.15:
        violations.append('fakequant rate %.1f exceeds copy rate %.1f — '
                          'probe traffic accounting is broken'
                          % (fq_rate, cp_rate))
    return violations


def timed_gbs(step, x, bytes_per_call):
    """bench.py's protocol: compile, warm, pipeline N dispatches, then
    device_get a value data-dependent on the last step."""
    x = step(x)
    x = step(x)
    float(jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0]))
    start = time.perf_counter()
    for _ in range(N_TIMED):
        x = step(x)
    float(jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0]))
    elapsed = time.perf_counter() - start
    return bytes_per_call * N_TIMED / elapsed / 1e9


def probe_copy1d():
    n = 128 * (1 << 20)  # 256 MB bf16
    k = 32
    x = jax.jit(lambda: jnp.zeros((n,), jnp.bfloat16))()

    @jax.jit
    def step(v):
        return lax.scan(lambda c, _: (c + jnp.bfloat16(1), None),
                        v, None, length=k)[0]

    return timed_gbs(step, x, 2.0 * n * 2 * k)


def probe_copy4d():
    shape = (256, 56, 56, 256)  # RN50 stage-2 bottleneck output, bs=256
    n = 1
    for d in shape:
        n *= d
    k = 24
    x = jax.jit(lambda: jnp.zeros(shape, jnp.bfloat16))()

    @jax.jit
    def step(v):
        return lax.scan(lambda c, _: (c + jnp.bfloat16(1), None),
                        v, None, length=k)[0]

    return timed_gbs(step, x, 2.0 * n * 2 * k)


def probe_bnstats():
    shape = (256, 56, 56, 256)
    n = 1
    for d in shape:
        n *= d
    k = 24
    x = jax.jit(lambda: jnp.ones(shape, jnp.bfloat16))()

    @jax.jit
    def step(v):
        def body(c, i):
            # read the full activation; write only scalars.  The i-dependent
            # scale defeats loop-invariant hoisting.
            s = jnp.sum(v * (1.0 + 1e-6 * i).astype(jnp.bfloat16),
                        dtype=jnp.float32)
            s2 = jnp.sum(jnp.square(v.astype(jnp.float32)))
            return c + s + s2, None
        acc = lax.scan(body, jnp.float32(0), jnp.arange(k))[0]
        # fold the accumulator back into one element so the next call's
        # input depends on this call's reduction (serializes dispatches)
        return v.at[0, 0, 0, 0].add((acc * 0).astype(jnp.bfloat16))

    return timed_gbs(step, x, float(n) * 2 * k)


def probe_conv(kernel_hw, shape, cout, k):
    cin = shape[-1]
    x = jax.jit(lambda: jnp.zeros(shape, jnp.bfloat16))()
    # small weights so the repeated conv chain decays instead of overflowing;
    # no output epilogue AT ALL — the carry is the raw conv output, so the
    # measured time is the conv kernel alone (an extra scalar-multiply pass
    # depressed the first version of this probe by ~30%)
    w = jax.jit(lambda: jnp.full((kernel_hw, kernel_hw, cin, cout),
                                 1e-3, jnp.bfloat16))()
    n_in = 1
    for d in shape:
        n_in *= d
    n_out = n_in // cin * cout
    assert cout == cin, 'carry shape must be preserved'

    @jax.jit
    def step(v):
        def body(c, _):
            y = lax.conv_general_dilated(
                c, w, (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.bfloat16)
            return y, None
        return lax.scan(body, v, None, length=k)[0]

    # traffic: read input + write output per iteration (weights stay
    # VMEM-resident across the scan body's single use; count them 0)
    return timed_gbs(step, x, float(n_in + n_out) * 2 * k)


def probe_matmul_tflops():
    """Sustained big-matmul rate (the MXU ceiling conv efficiency is judged
    against): 8192^3 bf16, chained through the carry."""
    m = 8192
    k = 8
    a = jax.jit(lambda: jnp.full((m, m), 1e-2, jnp.bfloat16))()
    b = jax.jit(lambda: jnp.eye(m, dtype=jnp.bfloat16))()

    @jax.jit
    def step(v):
        return lax.scan(lambda c, _: (jnp.dot(
            c, b, preferred_element_type=jnp.bfloat16), None),
            v, None, length=k)[0]

    flops_per_call = 2.0 * m * m * m * k
    x = step(a)
    x = step(x)
    float(jax.device_get(x[0, 0]))
    start = time.perf_counter()
    for _ in range(N_TIMED):
        x = step(x)
    float(jax.device_get(x[0, 0]))
    elapsed = time.perf_counter() - start
    return flops_per_call * N_TIMED / elapsed / 1e12


def probe_fakequant():
    shape = (256, 56, 56, 256)
    n = 1
    for d in shape:
        n *= d
    k = 16
    x = jax.jit(lambda: jnp.ones(shape, jnp.bfloat16))()
    from pocketflow_tpu.ops import fake_quant as fq

    @jax.jit
    def step(v):
        def body(c, i):
            y = fq.fake_quant(c.astype(jnp.float32), 8).astype(jnp.bfloat16)
            return y + (1e-6 * i).astype(jnp.bfloat16), None
        return lax.scan(body, v, jnp.arange(k))[0]

    # the chain reads the tensor (minmax pass fuses with the apply in XLA's
    # best case: 1 read + 1 write; worst case 2 reads + 1 write).  Count the
    # OPTIMISTIC 1r+1w so the printed GB/s is comparable with copy4d; a
    # value well under copy4d means the extra pass is real.
    return timed_gbs(step, x, 2.0 * n * 2 * k)


def probe_optimizer():
    n = 26 * (1 << 20)  # ~RN50 param count, fp32
    k = 32
    p = jax.jit(lambda: jnp.zeros((n,), jnp.float32))()
    m = jax.jit(lambda: jnp.zeros((n,), jnp.float32))()
    g = jax.jit(lambda: jnp.full((n,), 1e-6, jnp.float32))()

    @jax.jit
    def step(state):
        def body(c, _):
            pp, mm = c
            mm = 0.9 * mm + g
            pp = pp - 1e-3 * mm
            return (pp, mm), None
        return lax.scan(body, state, None, length=k)[0]

    # read p,m,g + write p,m = 5 arrays of n fp32 per iteration
    return timed_gbs(step, (p, m), 5.0 * n * 4 * k)


def main():
    probes = {
        'copy1d_gb_s': probe_copy1d,
        'copy4d_gb_s': probe_copy4d,
        'bnstats_gb_s': probe_bnstats,
        'conv1x1_gb_s': lambda: probe_conv(1, (256, 56, 56, 256), 256, 12),
        'conv3x3_gb_s': lambda: probe_conv(3, (256, 28, 28, 256), 256, 12),
        'fakequant_gb_s': probe_fakequant,
        'optimizer_gb_s': probe_optimizer,
        'matmul8k_tflop_s': probe_matmul_tflops,
    }
    results = {}
    for name, fn in probes.items():
        results[name] = round(fn(), 1)
        print(json.dumps({name: results[name]}), flush=True)
    path = RESULTS if '--publish' in sys.argv else os.path.join(
        os.environ.get('PF_PARITY_OUT', '/tmp/pf_parity_results'),
        'roofline_probe.json')
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'w') as fout:
        json.dump(results, fout, indent=2)
    print('results written to %s' % path)
    violations = check_results(results)
    if violations:
        print('ROOFLINE PROBE SANITY VIOLATIONS:')
        for v in violations:
            print('  ' + v)
        sys.exit(1)


if __name__ == '__main__':
    main()
