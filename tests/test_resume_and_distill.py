"""Checkpoint resume + distillation-composition tests (SURVEY §5.4)."""

import os

import jax
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def _helper():
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    return ModelHelper()


@pytest.mark.slow
def test_train_resumes_from_checkpoint(tmp_path):
    """Interrupt training mid-way; a fresh learner must resume at the saved
    step and finish without repeating completed iterations."""
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    with FLAGS.scope(batch_size=16, nb_smpls_train=480, nb_smpls_eval=64,
                     batch_size_eval=32, nb_epochs_rat=0.05, lrn_rate_init=0.05):
        learner = FullPrecLearner(None, _helper())
        state, tx, _ = learner.init_state()
        step = learner.build_train_step(tx)
        it = learner.dataset_train.build()
        for i in range(10):
            state, _ = step(state, next(it), jax.random.fold_in(jax.random.PRNGKey(0), i))
        learner.save_model(state)  # "crash" after 10 steps

        resumed_learner = FullPrecLearner(None, _helper())
        fresh, tx2, _ = resumed_learner.init_state()
        restored = resumed_learner.restore_model(fresh)
        assert restored is not None
        assert int(jax.device_get(restored.step)) == 10
        step2 = resumed_learner.build_train_step(tx2)
        final = resumed_learner.run_train_loop(restored, step2)
        # loop starts at step 10 and runs to nb_iters_train exactly once
        assert int(jax.device_get(final.step)) == resumed_learner.nb_iters_train


@pytest.mark.slow
def test_distillation_composes_with_weight_sparse(tmp_path):
    """--enbl_dst must work inside a compression learner's fused step."""
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.learners.weight_sparsification.learner import WeightSparseLearner
    with FLAGS.scope(batch_size=16, nb_smpls_train=480, nb_smpls_eval=64,
                     batch_size_eval=32, nb_epochs_rat=0.05, lrn_rate_init=0.05):
        FullPrecLearner(None, _helper()).train()  # the teacher checkpoint
        with FLAGS.scope(enbl_dst=True, ws_prune_ratio=0.5,
                         ws_prune_ratio_prtl='uniform', ws_mask_update_step=5,
                         ws_save_path=str(tmp_path / 'ws' / 'model.ckpt')):
            learner = WeightSparseLearner(None, _helper())
            assert learner.helper_dst is not None
            state = learner.train()
            from pocketflow_tpu.learners.weight_sparsification import masking
            pr = float(jax.device_get(masking.calc_prune_ratio(
                state.params, maskable_only=True)))
            assert pr == pytest.approx(0.5, abs=0.02)
