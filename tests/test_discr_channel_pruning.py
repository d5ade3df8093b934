"""Tests for discrimination-aware channel pruning (dis-chn-pruned)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def test_aux_head_shapes():
    from pocketflow_tpu.learners.discr_channel_pruning.learner import AuxHead
    head = AuxHead(nb_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 7, 16))
    params = head.init(jax.random.PRNGKey(1), x)['params']
    logits = head.apply({'params': params}, x)
    assert logits.shape == (4, 10)
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.mark.slow
def test_dcp_end_to_end(tmp_path):
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.learners.discr_channel_pruning import DisChnPrunedLearner
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    with FLAGS.scope(batch_size=16, nb_smpls_train=480, nb_smpls_eval=128,
                     batch_size_eval=32, nb_epochs_rat=0.05, lrn_rate_init=0.05):
        FullPrecLearner(None, ModelHelper()).train()
        with FLAGS.scope(dcp_prune_ratio=0.5, dcp_nb_stages=1,
                         dcp_nb_iters_block=6, dcp_nb_iters_layer=2,
                         dcp_save_path=str(tmp_path / 'dcp' / 'model.ckpt')):
            learner = DisChnPrunedLearner(None, ModelHelper())
            state = learner.train()
            # conv2 must have exactly 16/32 input channels zeroed
            k = np.asarray(jax.device_get(state.params['conv2']['kernel']))
            chn_norms = np.linalg.norm(k.transpose(2, 0, 1, 3).reshape(32, -1), axis=1)
            assert np.sum(chn_norms == 0.0) == 16, chn_norms
            metrics = learner.run_eval_loop(state, learner.build_eval_step())
            assert metrics['accuracy'] > 0.5
