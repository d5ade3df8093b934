"""Tests for the PGD/group-LASSO channel pruner (chn-pruned-gpu)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def test_group_lasso_shrink_zeroes_weak_channels():
    from pocketflow_tpu.learners.channel_pruning_gpu.learner import (
        channel_norms, group_lasso_shrink)
    # channels 0..7 with increasing magnitude; 50th percentile kills ~half
    k = jnp.stack([jnp.full((3, 3, 16), 0.1 * (c + 1)) for c in range(8)],
                  axis=2).transpose(0, 1, 2, 3)  # HWIO with I=8... build directly
    k = jnp.ones((3, 3, 8, 16)) * jnp.arange(1, 9).reshape(1, 1, 8, 1) * 0.1
    out = group_lasso_shrink(k, jnp.asarray(50.0))
    norms = np.asarray(channel_norms(out)).reshape(-1)
    assert np.sum(norms == 0.0) >= 3  # weakest channels fully zeroed
    assert norms[-1] > 0  # strongest survives


def test_channel_norms_shape():
    from pocketflow_tpu.learners.channel_pruning_gpu.learner import channel_norms
    k = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 12, 24))
    n = channel_norms(k)
    assert n.shape == (1, 1, 12, 1)
    np.testing.assert_allclose(
        np.asarray(n).reshape(-1),
        np.linalg.norm(np.asarray(k).transpose(2, 0, 1, 3).reshape(12, -1), axis=1),
        rtol=1e-5)


@pytest.mark.slow
def test_cpg_end_to_end(tmp_path):
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.learners.channel_pruning_gpu import ChannelPrunedGpuLearner
    from pocketflow_tpu.learners.channel_pruning_gpu.learner import channel_norms
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    with FLAGS.scope(batch_size=16, nb_smpls_train=480, nb_smpls_eval=128,
                     batch_size_eval=32, nb_epochs_rat=0.05, lrn_rate_init=0.05):
        FullPrecLearner(None, ModelHelper()).train()
        with FLAGS.scope(cpg_prune_ratio=0.5, cpg_skip_ht_layers=False,
                         cpg_nb_iters_layer=24,
                         cpg_save_path=str(tmp_path / 'cpg' / 'model.ckpt')):
            learner = ChannelPrunedGpuLearner(None, ModelHelper())
            state = learner.train()
            # conv2 (3x3x32x64) must have ~50% of its 32 input channels zeroed
            n = np.asarray(jax.device_get(channel_norms(
                state.params['conv2']['kernel']))).reshape(-1)
            pruned_frac = float(np.mean(n == 0.0))
            assert pruned_frac >= 0.4, pruned_frac
            metrics = learner.run_eval_loop(state, learner.build_pruned_eval_step())
            assert metrics['accuracy'] > 0.5
