"""cp_finetune between list groups (reference __prune_and_finetune_list)."""

import jax
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


@pytest.mark.slow
def test_cp_list_mode_with_group_finetune(tmp_path):
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.learners.channel_pruning import ChannelPrunedLearner
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    ratio_file = tmp_path / 'ratio.list'
    ratio_file.write_text('0.5\n')
    with FLAGS.scope(batch_size=16, nb_smpls_train=480, nb_smpls_eval=128,
                     batch_size_eval=32, nb_epochs_rat=0.05, lrn_rate_init=0.05):
        FullPrecLearner(None, ModelHelper()).train()
        with FLAGS.scope(cp_prune_option='list',
                         cp_prune_list_file=str(ratio_file),
                         cp_finetune=True, cp_list_group=8,
                         cp_nb_batches=3, cp_nb_points_per_layer=4,
                         cp_nb_iters_ft_ratio=0.2,
                         cp_channel_pruned_path=str(tmp_path / 'cp' / 'model.ckpt')):
            learner = ChannelPrunedLearner(None, ModelHelper())
            state = learner.train()
            k = np.asarray(jax.device_get(state.params['conv2']['kernel']))
            chn_norms = np.linalg.norm(k.transpose(2, 0, 1, 3).reshape(32, -1), axis=1)
            assert int(np.sum(chn_norms > 0)) <= 20
            metrics = learner.run_eval_loop(state, learner.build_eval_step())
            assert metrics['accuracy'] > 0.5
