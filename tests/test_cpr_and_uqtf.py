"""Tests for chn-pruned-rmt (meta-LASSO/meta-lstsq) and uniform-tf (QAT 8/8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def test_meta_lstsq_converges_to_closed_form():
    from pocketflow_tpu.learners.channel_pruning_rmt.learner import make_meta_lstsq
    rng = np.random.default_rng(0)
    X = rng.normal(size=(256, 12)).astype(np.float32)
    W_true = rng.normal(size=(12, 4)).astype(np.float32)
    Y = X @ W_true
    solve = make_meta_lstsq(nb_iters=2000, lrn_rate=5e-2)
    W = np.asarray(solve(jnp.asarray(X), jnp.asarray(Y),
                         jnp.zeros((12, 4), jnp.float32)))
    np.testing.assert_allclose(W, W_true, atol=0.05)


def test_meta_lasso_shrinks():
    from pocketflow_tpu.learners.channel_pruning_rmt.learner import make_meta_lasso
    rng = np.random.default_rng(1)
    P = rng.normal(size=(128, 8)).astype(np.float32)
    y = P[:, 0] * 3.0  # only channel 0 matters
    solve = make_meta_lasso(nb_iters=500, lrn_rate=0.3)
    beta = np.asarray(solve(jnp.asarray(P), jnp.asarray(y), jnp.float32(0.05)))
    assert np.argmax(np.abs(beta)) == 0
    assert np.abs(beta[0]) > 1.0


def test_fake_quant_with_range_ste():
    from pocketflow_tpu.ops.fake_quant import fake_quant_with_range
    x = jnp.asarray(np.linspace(-2.0, 8.0, 101), jnp.float32)
    q = fake_quant_with_range(x, jnp.float32(0.0), jnp.float32(6.0),
                              jnp.float32(8.0))
    qn = np.asarray(q)
    assert qn.min() >= 0.0 and qn.max() <= 6.0  # clipped to range
    assert len(np.unique(qn)) <= 256
    # STE: grads pass inside the range, zero outside
    g = jax.grad(lambda v: jnp.sum(fake_quant_with_range(
        v, jnp.float32(0.0), jnp.float32(6.0), jnp.float32(8.0))))(x)
    gn = np.asarray(g)
    assert np.all(gn[(np.asarray(x) >= 0) & (np.asarray(x) <= 6)] == 1.0)
    assert np.all(gn[np.asarray(x) < 0] == 0.0)
    assert np.all(gn[np.asarray(x) > 6] == 0.0)


@pytest.mark.slow
def test_cpr_end_to_end(tmp_path):
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.learners.channel_pruning_rmt import ChannelPrunedRmtLearner
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    with FLAGS.scope(batch_size=16, nb_smpls_train=480, nb_smpls_eval=128,
                     batch_size_eval=32, nb_epochs_rat=0.05, lrn_rate_init=0.05):
        FullPrecLearner(None, ModelHelper()).train()
        with FLAGS.scope(cpr_prune_ratio=0.5, cpr_skip_frst_layer=True,
                         cpr_nb_smpls=256, cpr_nb_crops_per_smpl=4,
                         cpr_ista_nb_iters=50, cpr_lstsq_nb_iters=50,
                         cp_nb_batches=3,
                         cpr_save_path=str(tmp_path / 'cpr' / 'model.ckpt')):
            learner = ChannelPrunedRmtLearner(None, ModelHelper())
            state = learner.train()
            k = np.asarray(jax.device_get(state.params['conv2']['kernel']))
            chn_norms = np.linalg.norm(k.transpose(2, 0, 1, 3).reshape(32, -1), axis=1)
            assert int(np.sum(chn_norms == 0.0)) == 16
            metrics = learner.run_eval_loop(state, learner.build_eval_step())
            assert metrics['accuracy'] > 0.5


@pytest.mark.slow
def test_uqtf_end_to_end(tmp_path):
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.learners.uniform_quantization_tf import UniformQuantTFLearner
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    with FLAGS.scope(batch_size=16, nb_smpls_train=480, nb_smpls_eval=128,
                     batch_size_eval=32, nb_epochs_rat=0.05, lrn_rate_init=0.05):
        FullPrecLearner(None, ModelHelper()).train()
        with FLAGS.scope(uql_quant_epochs=8, uqtf_quant_delay=2,
                         uqtf_freeze_bn_delay=8, uqtf_ema_decay=0.9,
                         uqtf_save_path=str(tmp_path / 'uqtf' / 'model.ckpt')):
            learner = UniformQuantTFLearner(None, ModelHelper())
            state = learner.train()
            # EMA ranges must have moved off their init values
            act_max = np.asarray(jax.device_get(state.extra['act_max']))
            assert np.any(np.abs(act_max - 6.0) > 1e-3)
            metrics = learner.run_eval_loop(state, learner.build_qat_eval_step())
            assert metrics['accuracy'] > 0.5

            # resume contract: a second train() must pick up the saved
            # checkpoint at its final step and run ZERO further iterations
            # (a preempted job must not silently retrain from the baseline)
            learner2 = UniformQuantTFLearner(None, ModelHelper())
            state2 = learner2.train()
            assert int(jax.device_get(state2.step)) == \
                int(jax.device_get(state.step))
            np.testing.assert_allclose(
                np.asarray(jax.device_get(state2.extra['act_max'])),
                act_max, atol=1e-6)
