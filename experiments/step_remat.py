"""Does block rematerialization pay on the bandwidth-bound QAT RN50 step?

Times the full QAT ResNet-50 train step (bs 256, bf16) for
--remat_blocks in {none, save_convs, full}, interleaved in one session.
Rationale: the step is HBM-bound; remat trades recompute (idle MXU) for
activation traffic, so 'save_convs' (store conv products only, recompute
BN/ReLU chains in backward) could cut real bytes.

Run on the chip: python experiments/step_remat.py

RESULT (2026-08-16, interleaved medians, bs 256): none 105.2 ms (2434
img/s), save_convs 119.3 ms, full 128.3 ms — remat LOSES throughput on
this chip: the recompute's re-reads outweigh the saved activation
stores on an already bandwidth-saturated step.  --remat_blocks stays a
MEMORY knob (bigger batches / deeper models per chip), not a speed one.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

MODES = ('none', 'save_convs', 'full')
BATCH = int(os.environ.get('BENCH_BATCH_SIZE', '256'))


def build(mode):
    import pocketflow_tpu  # noqa: F401
    from pocketflow_tpu.config import FLAGS
    from pocketflow_tpu.learners.uniform_quantization.learner import \
        UniformQuantLearner
    from pocketflow_tpu.nets.resnet_at_ilsvrc12 import ModelHelper
    scope = FLAGS.scope(
        synthetic_data=True, compute_dtype='bfloat16', summ_step=10 ** 9,
        save_step=10 ** 9, resnet_stem_s2d=True, remat_blocks=mode,
        batch_size=BATCH, batch_size_eval=BATCH, nb_smpls_train=4096,
        nb_smpls_eval=512, nb_epochs_rat=1.0)
    scope.__enter__()
    learner = UniformQuantLearner(None, ModelHelper(resnet_size=50))
    state, tx, _ = learner.init_state_quant()
    step = learner.build_quant_train_step(tx)
    batch = jax.device_put(next(learner.dataset_train.build()))
    jax.block_until_ready(batch)
    rng = jax.random.PRNGKey(0)
    state, m = step(state, batch, rng)  # compile
    float(jax.device_get(m['accuracy']))
    scope.__exit__(None, None, None)
    return state, step, batch


def timed(state, step, batch, reps=10):
    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(reps):
        state, m = step(state, batch, jax.random.fold_in(rng, i))
    float(jax.device_get(m['accuracy']))
    return (time.perf_counter() - t0) / reps * 1e3, state


def main():
    built = {m: build(m) for m in MODES}
    times = {m: [] for m in MODES}
    for _ in range(4):
        for m in MODES:
            state, step, batch = built[m]
            dt, state = timed(state, step, batch)
            built[m] = (state, step, batch)
            times[m].append(dt)
    for m in MODES:
        med = statistics.median(times[m])
        print('%-11s: %7.2f ms/step  (%.0f img/s)  runs=%s'
              % (m, med, BATCH / med * 1e3,
                 ['%.1f' % t for t in times[m]]), flush=True)


if __name__ == '__main__':
    main()
