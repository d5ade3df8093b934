"""Benchmark: QAT ResNet-50 @ ILSVRC-12 training throughput (images/sec/chip).

Per BASELINE.json, the headline metric is images/sec/chip for QAT ResNet-50.
vs_baseline normalizes against an A100 TF1-graph QAT ResNet-50 reference
estimate (~750 img/s/GPU); the north-star target is >=3x that.

The primary `value` is measured at EXACT synchronous-BN semantics (the
framework default, a strict improvement on the reference's per-GPU BN).  The
relaxed-semantics figure (`bn_stats_subsample=8`, which matches the reference
baseline's 32-sample per-GPU BN statistics regime) is reported as the labeled
extra field `value_ghost_bn_8`.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

A100_TF_QAT_RESNET50_IMG_PER_SEC = 750.0

BATCH_SIZE = int(os.environ.get('BENCH_BATCH_SIZE', '256'))
N_WARMUP = 5
N_TIMED = 20

# Regression floor: locked 3% below the round-3 measured 2556.84 img/s/chip
# (exact sync-BN).  The bench exits nonzero below this so a perf regression
# fails the driver run instead of waiting for a human to read BENCH_r*.json.
EXACT_BN_FLOOR_IMG_PER_SEC = 2480.0
# Real HBM traffic per batch-256 step (measured via XLA cost_analysis + the
# copy-add roofline probes, docs/performance.md "The roofline, corrected"):
# ~35 GB.  Every bench run probes BOTH measured envelopes in-session so the
# "envelope-bound" claim is falsifiable against the same session's rates,
# not a stale constant (experiments/roofline_probe.py, round 5):
#  - streaming (copy-add) ceiling: ~480-500 GB/s;
#  - conv envelope at the RN50 trunk shapes: ~200-250 GB/s (XLA conv ==
#    XLA dot == hand-tiled Pallas within 5%, experiments/conv1x1_ab.py —
#    the chip's limit for low-arithmetic-intensity matmuls).
# The step's achieved rate mixes the two patterns, so the falsifiable
# invariant is conv_envelope <= achieved <= streaming: below the conv
# envelope means the step got slower than its slowest pattern (a real
# regression); above streaming means the traffic model is wrong.
HBM_GB_PER_STEP = 35.0


def measure_hbm_ceiling():
    """Same-session practical streaming bandwidth: a jitted bf16 copy-add
    over a 256 MB buffer, looped K times INSIDE the jit via lax.scan so one
    dispatch carries ~16 GB of HBM traffic (read + write per iteration; scan
    iterations cannot fuse, each materializes its carry).  A single add per
    call (1.4 ms of real work) would measure the axon tunnel's per-dispatch
    overhead instead of bandwidth — that variant reads ~130 GB/s on a chip
    whose train steps sustain 348 GB/s.  Timed with the same
    pipelined-dispatch + data-dependent-device_get protocol as the train
    steps."""
    from jax import lax
    n = 128 * (1 << 20)  # 128M bf16 elements = 256 MB
    k_inner = 32         # 32 x 512 MB = 16 GB of traffic per dispatch

    x = jax.jit(lambda: jnp.zeros((n,), jnp.bfloat16))()

    @jax.jit
    def step(v):
        return lax.scan(lambda c, _: (c + jnp.bfloat16(1), None),
                        v, None, length=k_inner)[0]

    x = step(x)  # compile
    x = step(x)  # warm
    float(jax.device_get(x[0]))
    n_timed = 4
    start = time.perf_counter()
    for _ in range(n_timed):
        x = step(x)
    float(jax.device_get(x[0]))
    elapsed = time.perf_counter() - start
    # bf16 = 2 bytes; traffic per scan iter = read n + write n
    return 2.0 * n * 2 * k_inner * n_timed / elapsed / 1e9  # GB/s


def measure_conv_envelope():
    """Same-session effective rate of the dominant 1x1-conv pattern
    (bs-256 RN50 trunk shape), chained through a lax.scan carry like the
    streaming probe.  This is the step's SLOWEST access pattern — measured
    identical across XLA conv / XLA dot / hand-tiled Pallas
    (experiments/conv1x1_ab.py), i.e. the chip envelope, not a lowering
    artifact."""
    from jax import lax
    shape = (256, 56, 56, 256)
    c = shape[-1]
    k_inner = 12
    n_elems = 1
    for d in shape:
        n_elems *= d
    x = jax.jit(lambda: jnp.full(shape, 0.5, jnp.bfloat16))()
    w = jax.jit(lambda: (jnp.eye(c) * 0.999)
                .astype(jnp.bfloat16).reshape(1, 1, c, c))()

    @jax.jit
    def step(v):
        def body(carry, _):
            return lax.conv_general_dilated(
                carry, w, (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.bfloat16), None
        return lax.scan(body, v, None, length=k_inner)[0]

    x = step(x)
    x = step(x)
    float(jax.device_get(x[0, 0, 0, 0]))
    n_timed = 4
    start = time.perf_counter()
    for _ in range(n_timed):
        x = step(x)
    float(jax.device_get(x[0, 0, 0, 0]))
    elapsed = time.perf_counter() - start
    return 2.0 * n_elems * 2 * k_inner * n_timed / elapsed / 1e9  # GB/s


def measure(bn_stats_subsample, composed=False):
    """Measure steady-state train-step throughput at the given BN regime.

    composed=True measures the CP+QAT composed step (BASELINE.json's target
    sentence stacks the two flagship learners): 50% of input channels masked
    per conv kernel, with the masked-gradient transform and the post-update
    re-zero the channel learner's finetune uses, on top of the QAT fake-quant
    policy — the train step `experiments/composed_cp_qat.py` locks for
    accuracy."""
    from pocketflow_tpu.config import FLAGS
    from pocketflow_tpu.nets.resnet_at_ilsvrc12 import ModelHelper
    from pocketflow_tpu.learners.full_precision import FullPrecLearner

    qat = True
    try:
        from pocketflow_tpu.learners.uniform_quantization.learner import UniformQuantLearner
    except ImportError:
        qat = False

    with FLAGS.scope(batch_size=BATCH_SIZE, batch_size_eval=BATCH_SIZE,
                     nb_smpls_train=4096, nb_smpls_eval=512, nb_epochs_rat=1.0,
                     bn_stats_subsample=bn_stats_subsample):
        helper = ModelHelper(resnet_size=50)
        if qat:
            learner = UniformQuantLearner(None, helper)
            state, tx, _ = learner.init_state_quant()
            if composed:
                from pocketflow_tpu.learners.weight_sparsification import masking
                mrng = np.random.default_rng(0)

                def mk(leaf):
                    if leaf.ndim == 4 and leaf.shape[2] > 16:
                        c = leaf.shape[2]
                        alive = np.zeros(c, np.float32)
                        alive[mrng.permutation(c)[:(c + 1) // 2]] = 1.0
                        return jnp.asarray(alive.reshape(1, 1, -1, 1))
                    return jnp.ones((), jnp.float32)

                masks = jax.tree_util.tree_map(mk, state.params)
                state = learner.set_extra(state,
                                          {**state.extra, 'masks': masks})
                train_step = learner.build_train_step(
                    tx, policy_fn=learner._policy_fn(),
                    grad_transform_fn=lambda g, s: masking.mask_gradients(
                        g, s.extra['masks']),
                    post_update_fn=lambda s: s.replace(
                        params=masking.apply_masks(s.params,
                                                   s.extra['masks'])))
            else:
                train_step = learner.build_quant_train_step(tx)
        else:
            learner = FullPrecLearner(None, helper)
            state, tx, _ = learner.init_state()
            train_step = learner.build_train_step(tx)

        iterator = learner.dataset_train.build()
        rng = jax.random.PRNGKey(0)
        # Pre-stage a few device-resident batches and cycle them: this
        # measures the training-step throughput (what the chip sustains with
        # a healthy host pipeline), not the bench harness's remote-tunnel
        # host->device copy bandwidth, which no production TPU host has.
        batches = [jax.device_put(next(iterator)) for _ in range(4)]
        jax.block_until_ready(batches)

        # compile + warmup
        state, metrics = train_step(state, batches[0], rng)
        jax.block_until_ready(metrics)
        for i in range(N_WARMUP):
            state, metrics = train_step(state, batches[i % len(batches)],
                                        jax.random.fold_in(rng, i))
        jax.block_until_ready(metrics)

        start = time.perf_counter()
        for i in range(N_TIMED):
            state, metrics = train_step(state, batches[i % len(batches)],
                                        jax.random.fold_in(rng, 100 + i))
        # device_get forces a REAL value transfer (the steps chain through
        # `state`, so this cannot complete before every step has executed);
        # block_until_ready alone does not synchronize remote execution on
        # tunneled backends
        float(jax.device_get(metrics['accuracy']))
        elapsed = time.perf_counter() - start

    n_chips = max(1, len(jax.devices()))
    return BATCH_SIZE * N_TIMED / elapsed / n_chips, qat


def main():
    import pocketflow_tpu  # noqa: F401
    from pocketflow_tpu.config import FLAGS
    FLAGS.override(synthetic_data=True, compute_dtype='bfloat16',
                   summ_step=10 ** 9, save_step=10 ** 9,
                   resnet_stem_s2d=True)  # MXU-dense stem (MLPerf trick)

    # Primary: exact synchronous BN (bn_stats_subsample=1, framework default).
    exact, qat = measure(bn_stats_subsample=1)
    # Extra: ghost-BN stride 8 == the A100 baseline's per-GPU 32-sample BN
    # statistics regime (Horovod batch 256 over 8 workers); see
    # docs/performance.md for the semantics discussion.
    ghost, _ = measure(bn_stats_subsample=8)
    # Extra: the composed CP+QAT step (masked grads + re-zero on top of the
    # fake-quant policy) — the north-star pipeline's training throughput
    pruned_qat, _ = measure(bn_stats_subsample=1, composed=True)

    # achieved HBM rate of the step (modeled 35 GB / measured time) plus the
    # SAME-SESSION measured envelopes so the envelope-bound claim stays
    # falsifiable: conv_envelope <= achieved <= streaming (see the constant
    # block above; experiments/{roofline_probe,conv1x1_ab}.py for the
    # per-pattern decomposition and the lowering A/B behind it)
    step_time = BATCH_SIZE / exact if exact > 0 else float('inf')
    achieved_gb_s = HBM_GB_PER_STEP / step_time
    streaming_gb_s = measure_hbm_ceiling()
    conv_env_gb_s = measure_conv_envelope()

    print(json.dumps({
        'metric': 'images/sec/chip (%s ResNet-50 @ 224, bf16, bs=%d, exact sync-BN)'
                  % ('QAT' if qat else 'full-prec', BATCH_SIZE),
        'value': round(exact, 2),
        'unit': 'images/sec/chip',
        'vs_baseline': round(exact / A100_TF_QAT_RESNET50_IMG_PER_SEC, 3),
        'value_ghost_bn_8': round(ghost, 2),
        'vs_baseline_ghost_bn_8': round(ghost / A100_TF_QAT_RESNET50_IMG_PER_SEC, 3),
        'value_pruned_qat': round(pruned_qat, 2),
        'hbm_gb_per_s': round(achieved_gb_s, 1),
        'hbm_streaming_gb_per_s': round(streaming_gb_s, 1),
        'conv_envelope_gb_per_s': round(conv_env_gb_s, 1),
        'step_rate_in_envelope_band': bool(
            conv_env_gb_s <= achieved_gb_s <= streaming_gb_s),
        'floor_img_per_s': EXACT_BN_FLOOR_IMG_PER_SEC,
    }))

    if BATCH_SIZE == 256 and exact < EXACT_BN_FLOOR_IMG_PER_SEC:
        print('BENCH REGRESSION: exact sync-BN %.2f img/s/chip is below the '
              'locked floor %.1f (3%% under the round-3 measurement) — '
              'investigate before merging' % (exact, EXACT_BN_FLOOR_IMG_PER_SEC),
              file=sys.stderr)
        sys.exit(1)


if __name__ == '__main__':
    main()
