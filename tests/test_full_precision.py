"""End-to-end smoke tests for the FullPrec learner on the 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def _convnet_helper():
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    return ModelHelper()


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_full_prec_trains_and_loss_decreases(tmp_path):
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    with FLAGS.scope(batch_size=16, nb_smpls_train=512, nb_smpls_eval=256,
                     batch_size_eval=32, nb_epochs_rat=0.05, lrn_rate_init=0.05):
        learner = FullPrecLearner(None, _convnet_helper())
        state, tx, _ = learner.init_state()
        train_step = learner.build_train_step(tx)
        iterator = learner.dataset_train.build()
        rng = jax.random.PRNGKey(0)

        losses = []
        for idx in range(32):
            batch = next(iterator)
            state, metrics = train_step(state, batch, jax.random.fold_in(rng, idx))
            losses.append(float(jax.device_get(metrics['accuracy'])))
        # synthetic blobs are easy: accuracy should exceed 0.5 quickly
        assert np.mean(losses[-8:]) > 0.5, losses[-8:]

        eval_step = learner.build_eval_step()
        metrics = learner.run_eval_loop(state, eval_step, nb_batches=4)
        assert metrics['accuracy'] > 0.5


def test_full_prec_train_entrypoint_and_checkpoint(tmp_path):
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    with FLAGS.scope(batch_size=16, nb_smpls_train=480, nb_smpls_eval=128,
                     batch_size_eval=32, nb_epochs_rat=0.02, lrn_rate_init=0.05):
        learner = FullPrecLearner(None, _convnet_helper())
        state = learner.train()  # small: nb_iters ≈ 480*160*0.02/128 = 12
        assert int(jax.device_get(state.step)) == learner.nb_iters_train
        # checkpoint written; evaluate() restores it
        metrics = learner.evaluate()
        assert 'accuracy' in metrics


def test_distillation_helper(tmp_path):
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    with FLAGS.scope(batch_size=16, nb_smpls_train=480, nb_smpls_eval=128,
                     batch_size_eval=32, nb_epochs_rat=0.02, lrn_rate_init=0.05):
        teacher_learner = FullPrecLearner(None, _convnet_helper())
        teacher_learner.train()
    # now train a student with distillation on
    with FLAGS.scope(batch_size=16, nb_smpls_train=480, nb_smpls_eval=128,
                     batch_size_eval=32, nb_epochs_rat=0.02, lrn_rate_init=0.05,
                     enbl_dst=True):
        learner = FullPrecLearner(None, _convnet_helper())
        state, tx, _ = learner.init_state()
        train_step = learner.build_train_step(
            tx, loss_extra_fn=learner.helper_dst.loss_extra_fn())
        iterator = learner.dataset_train.build()
        batch = next(iterator)
        state, metrics = train_step(state, batch, jax.random.PRNGKey(1))
        assert 'dst_loss' in metrics
        assert float(jax.device_get(metrics['dst_loss'])) >= 0.0


def test_lr_schedule_piecewise():
    from pocketflow_tpu.core import schedules
    with FLAGS.scope(lrn_rate_init=0.1, batch_size_norm=128, nb_epochs_rat=1.0):
        sched = schedules.piecewise_constant(
            128, [10, 20], [1.0, 0.1, 0.01], nb_smpls_train=1280)
        # 10 batches/epoch -> boundaries at steps 100, 200; the reference's
        # tf.train.piecewise_constant keeps the PRE-decay value AT the
        # boundary (`x <= boundary`)
        assert np.isclose(float(sched(0)), 0.1)
        assert np.isclose(float(sched(100)), 0.1)
        assert np.isclose(float(sched(101)), 0.01)
        assert np.isclose(float(sched(200)), 0.01)
        assert np.isclose(float(sched(201)), 0.001)


def test_lr_schedule_exponential():
    from pocketflow_tpu.core import schedules
    with FLAGS.scope(lrn_rate_init=0.1, batch_size_norm=128, nb_epochs_rat=1.0):
        sched = schedules.exponential_decay(128, 1.0, 0.5, nb_smpls_train=1280)
        assert np.isclose(float(sched(0)), 0.1)
        assert np.isclose(float(sched(10)), 0.05)
        assert np.isclose(float(sched(25)), 0.025)
