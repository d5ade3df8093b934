"""Step-time ablations for QAT ResNet-50 on the real chip.

Times the full train step and ablated variants to locate HBM-traffic hot
spots (the step is bandwidth-bound: ~20 ms of MXU work inside ~100 ms).
Run on the TPU: python experiments/step_ablation.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = int(os.environ.get('BENCH_BATCH_SIZE', '256'))
N = int(os.environ.get('BENCH_STEPS', '10'))


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn(*args)
    jax.block_until_ready(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / N * 1e3


def main():
    import pocketflow_tpu  # noqa: F401
    from pocketflow_tpu.config import FLAGS
    FLAGS.override(synthetic_data=True, compute_dtype='bfloat16',
                   summ_step=10**9, save_step=10**9, resnet_stem_s2d=True,
                   batch_size=BATCH, batch_size_eval=BATCH,
                   nb_smpls_train=4096, nb_smpls_eval=512, nb_epochs_rat=1.0)

    from pocketflow_tpu.nets.resnet_at_ilsvrc12 import ModelHelper
    from pocketflow_tpu.learners.full_precision import FullPrecLearner

    helper = ModelHelper(resnet_size=50)
    learner = FullPrecLearner(None, helper)
    state, tx, _ = learner.init_state()
    it = learner.dataset_train.build()
    batch = jax.device_put(next(it))
    rng = jax.random.PRNGKey(0)
    model = learner.model

    images_u8 = batch['image']
    aug = jax.jit(lambda im, r: learner.dataset_train.augment(
        im, r, True).astype(jnp.bfloat16))
    images = jax.block_until_ready(aug(images_u8, rng))
    variables = {'params': state.params, 'batch_stats': state.batch_stats}

    print('augment only           : %7.2f ms' % timed(aug, images_u8, rng))

    fwd_train = jax.jit(lambda v, x: model.apply(
        v, x, train=True, mutable=['batch_stats'])[0])
    print('fwd train-BN           : %7.2f ms' % timed(fwd_train, variables, images))

    fwd_eval = jax.jit(lambda v, x: model.apply(v, x, train=False))
    print('fwd frozen-BN          : %7.2f ms' % timed(fwd_eval, variables, images))

    def loss_fn(params, bs, x):
        logits, upd = model.apply({'params': params, 'batch_stats': bs}, x,
                                  train=True, mutable=['batch_stats'])
        return jnp.mean(logits.astype(jnp.float32) ** 2), upd

    grad_full = jax.jit(lambda p, bs, x: jax.grad(
        lambda pp: loss_fn(pp, bs, x)[0])(p))
    print('fwd+bwd train-BN       : %7.2f ms' % timed(grad_full, state.params,
                                                      state.batch_stats, images))

    def loss_frozen(params, bs, x):
        logits = model.apply({'params': params, 'batch_stats': bs}, x, train=False)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    grad_frozen = jax.jit(lambda p, bs, x: jax.grad(
        lambda pp: loss_frozen(pp, bs, x))(p))
    print('fwd+bwd frozen-BN      : %7.2f ms' % timed(grad_frozen, state.params,
                                                      state.batch_stats, images))

    # full production step (QAT)
    try:
        from pocketflow_tpu.learners.uniform_quantization.learner import UniformQuantLearner
        ql = UniformQuantLearner(None, ModelHelper(resnet_size=50))
        qstate, qtx, _ = ql.init_state_quant()
        qstep = ql.build_quant_train_step(qtx)
        b2 = jax.device_put(next(it))

        def one(qs, bb, r):
            s2, m = qstep(qs, bb, r)
            return m['loss']
        print('QAT full step          : %7.2f ms' % timed(one, qstate, b2, rng))
    except Exception as exc:  # pragma: no cover
        print('QAT step failed:', exc)

    ms = timed(grad_full, state.params, state.batch_stats, images)
    print('img/s full-prec grad   : %7.1f' % (BATCH / ms * 1e3))


if __name__ == '__main__':
    main()
