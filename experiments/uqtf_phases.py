"""uniform-tf production QAT recipe: per-phase step time on ResNet-50.

The reference's published 8-bit results train with the uqtf pipeline
(quant_delay warm-up -> fake-quant QAT with EMA ranges -> BN frozen after
uqtf_freeze_bn_delay).  bench.py reports the exact-sync-BN QAT phase; this
experiment times all three phases of the SAME learner on the chip so the
production steady state (post-BN-freeze, the longest phase of a real run)
is on record.

Run on the chip: python experiments/uqtf_phases.py

RESULT (2026-08-17, bs 256, medians of 10 after 4 warm reps):
    warmup (quant off, exact BN)   115.1 ms/step (2224 img/s)
    QAT (EMA ranges, exact BN)     112.6 ms/step (2274 img/s)
    QAT + frozen BN (steady state)  97.7 ms/step (2621 img/s)
The production steady state (the longest phase of a real uqtf run) matches
the uql bench headline; the EMA min/max reductions cost ~8% while BN is
exact and nothing once BN freezes.  (Beware: the first post-compile timing
window on the tunneled chip can absorb >1 s of deferred work — warm several
reps before timing.)
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

BATCH = int(os.environ.get('BENCH_BATCH_SIZE', '256'))


def main():
    import pocketflow_tpu  # noqa: F401
    from pocketflow_tpu.config import FLAGS
    from pocketflow_tpu.learners.uniform_quantization_tf.learner import \
        UniformQuantTFLearner
    from pocketflow_tpu.nets.resnet_at_ilsvrc12 import ModelHelper

    with FLAGS.scope(synthetic_data=True, compute_dtype='bfloat16',
                     summ_step=10 ** 9, save_step=10 ** 9,
                     resnet_stem_s2d=True, batch_size=BATCH,
                     batch_size_eval=BATCH, nb_smpls_train=4096,
                     nb_smpls_eval=512, nb_epochs_rat=1.0,
                     uqtf_quant_delay=1000):
        learner = UniformQuantTFLearner(None, ModelHelper(resnet_size=50))
        state, tx, _ = learner.init_state_quant()
        step_bn = learner.build_qat_train_step(tx, freeze_bn=False)
        step_frozen = learner.build_qat_train_step(tx, freeze_bn=True)
        batch = jax.device_put(next(learner.dataset_train.build()))
        jax.block_until_ready(batch)
        rng = jax.random.PRNGKey(0)

        def timed(step, state, reps=10):
            # several warm reps: on the tunneled chip the first post-compile
            # window can absorb >1 s of deferred work and pollute the timing
            for i in range(4):
                state, m = step(state, batch, jax.random.fold_in(rng, 100 + i))
            float(jax.device_get(m['accuracy']))
            t0 = time.perf_counter()
            for i in range(reps):
                state, m = step(state, batch, jax.random.fold_in(rng, i))
            float(jax.device_get(m['accuracy']))
            return (time.perf_counter() - t0) / reps * 1e3, state

        phases = {}
        # phase 1: pre-quant-delay (fake-quant branch disabled via lax.cond)
        t, state = timed(step_bn, state)
        phases['warmup (quant off, exact BN)'] = t
        # phase 2: QAT with exact BN (step counter now past quant_delay)
        state = state.replace(step=2000)
        t, state = timed(step_bn, state)
        phases['QAT (EMA ranges, exact BN)'] = t
        # phase 3: the production steady state: QAT + frozen BN
        t, state = timed(step_frozen, state)
        phases['QAT + frozen BN (steady state)'] = t
        for name, ms in phases.items():
            print('%-34s %7.2f ms/step  (%4.0f img/s)'
                  % (name, ms, BATCH / ms * 1e3), flush=True)


if __name__ == '__main__':
    main()
