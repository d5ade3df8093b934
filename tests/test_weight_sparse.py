"""Tests for the weight-sparsification learner (masks, schedule, protocols)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def _convnet_helper():
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    return ModelHelper()


# ---------------------------------------------------------------------------
# pure-function kernel tests (SURVEY.md §4 implication (a))
# ---------------------------------------------------------------------------

def test_dynamic_prune_ratio_schedule():
    from pocketflow_tpu.learners.weight_sparsification import masking
    nb_iters = 1000
    with FLAGS.scope(ws_iter_ratio_beg=0.1, ws_iter_ratio_end=0.5,
                     ws_prune_ratio_exp=3.0):
        # before beg: ratio 0; after end: ratio = final; midpoint: closed form
        r0 = float(masking.dynamic_prune_ratio(jnp.asarray(50), nb_iters, 0.8))
        assert r0 == pytest.approx(0.0, abs=1e-6)
        r_end = float(masking.dynamic_prune_ratio(jnp.asarray(900), nb_iters, 0.8))
        assert r_end == pytest.approx(0.8, abs=1e-6)
        base = (300 - 100) / (500 - 100)
        expected = 0.8 * (1.0 - (1.0 - base) ** 3.0)
        r_mid = float(masking.dynamic_prune_ratio(jnp.asarray(300), nb_iters, 0.8))
        assert r_mid == pytest.approx(expected, rel=1e-5)


def test_percentile_mask_hits_target_sparsity():
    from pocketflow_tpu.learners.weight_sparsification import masking
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 64))
    for ratio in (0.25, 0.5, 0.9):
        mask = masking.percentile_mask(w, jnp.asarray(ratio))
        sparsity = 1.0 - float(jnp.mean(mask))
        assert sparsity == pytest.approx(ratio, abs=0.01)


def test_heurist_ratios_match_target_overall():
    from pocketflow_tpu.learners.weight_sparsification.pr_optimizer import PROptimizer
    shapes = [(3, 3, 1, 32), (3, 3, 32, 64), (3136, 1024), (1024, 10)]
    paths = ['conv1/kernel', 'conv2/kernel', 'fc3/kernel', 'fc4/kernel']
    with FLAGS.scope(ws_prune_ratio=0.6):
        pairs = PROptimizer._heurist(paths, shapes)
    nb = np.array([np.prod(s) for s in shapes], np.float64)
    ratios = np.array([r for _, r in pairs])
    overall = np.sum(nb * ratios) / np.sum(nb)
    assert overall == pytest.approx(0.6, rel=1e-6)
    # bigger layers get pruned more (log(#params) monotone)
    assert ratios[2] == max(ratios)


def test_rl_helper_budget_constraint():
    from pocketflow_tpu.learners.weight_sparsification.rl_helper import RLHelper
    shapes = [(3, 3, 1, 32), (3, 3, 32, 64), (3136, 1024), (1024, 10)]
    with FLAGS.scope(ws_prune_ratio=0.5, ws_reward_type='single-obj'):
        helper = RLHelper(shapes, skip_head_n_tail=False)
        # even if the agent always answers "prune nothing" (action=0), the
        # budget constraint must push the overall ratio to the target
        for idx in range(len(shapes)):
            helper.cvt_action_to_prune_ratio(idx, 0.0)
        assert helper.calc_overall_prune_ratio() >= 0.5 - 1e-6
        # states are finite & normalized
        for idx in range(len(shapes)):
            s = helper.calc_state(idx)
            assert np.all(np.isfinite(s)) and s.shape == (1, helper.s_dims)


def test_mask_gradients_zero_pruned_positions():
    from pocketflow_tpu.learners.weight_sparsification import masking
    params = {'conv': {'kernel': jnp.ones((3, 3, 4, 8)), 'bias': jnp.ones((8,))}}
    masks = jax.tree_util.tree_map_with_path(
        lambda p, l: jnp.zeros(l.shape) if masking.is_maskable_path(p)
        else jnp.ones(()), params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    out = masking.mask_gradients(grads, masks)
    assert float(jnp.sum(out['conv']['kernel'])) == 0.0
    assert float(jnp.sum(out['conv']['bias'])) == 8.0  # untouched


# ---------------------------------------------------------------------------
# end-to-end: uniform protocol on the tiny ConvNet
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_weight_sparse_uniform_end_to_end(tmp_path):
    from pocketflow_tpu.learners.weight_sparsification import masking
    from pocketflow_tpu.learners.weight_sparsification.learner import WeightSparseLearner
    with FLAGS.scope(batch_size=16, nb_smpls_train=480, nb_smpls_eval=128,
                     batch_size_eval=32, nb_epochs_rat=0.03, lrn_rate_init=0.05,
                     ws_prune_ratio=0.5, ws_prune_ratio_prtl='uniform',
                     ws_mask_update_step=5, ws_iter_ratio_beg=0.1,
                     ws_iter_ratio_end=0.5,
                     ws_save_path=str(tmp_path / 'models_ws' / 'model.ckpt')):
        learner = WeightSparseLearner(None, _convnet_helper())
        state = learner.train()
        # after training past iter_ratio_end the maskable sparsity == target
        pr_msk = float(jax.device_get(
            masking.calc_prune_ratio(state.params, maskable_only=True)))
        assert pr_msk == pytest.approx(0.5, abs=0.02), pr_msk
        metrics = learner.evaluate()
        assert np.isfinite(metrics['loss'])
        assert metrics['pr_msk'] == pytest.approx(0.5, abs=0.02)


@pytest.mark.slow
def test_pr_optimizer_optimal_ddpg_rollouts(tmp_path):
    """Tiny DDPG search: 3 roll-outs with fast finetune must run end-to-end."""
    from pocketflow_tpu.learners.weight_sparsification.learner import WeightSparseLearner
    from pocketflow_tpu.learners.weight_sparsification.pr_optimizer import PROptimizer
    with FLAGS.scope(batch_size=16, nb_smpls_train=256, nb_smpls_eval=64,
                     batch_size_eval=16, nb_epochs_rat=0.01, lrn_rate_init=0.05,
                     ws_prune_ratio=0.5, ws_prune_ratio_prtl='optimal',
                     ws_nb_rlouts=3, ws_nb_rlouts_min=1,
                     ws_nb_iters_rg=2, ws_nb_iters_ft=3, ws_nb_iters_feval=2,
                     ws_save_path=str(tmp_path / 'models_ws' / 'model.ckpt')):
        learner = WeightSparseLearner(None, _convnet_helper())
        state, _, _ = learner.init_state()
        pairs = PROptimizer(learner).run(full_params=state.params,
                                         batch_stats=state.batch_stats)
        assert len(pairs) == 4  # conv1, conv2, fc3, fc4 kernels
        ratios = np.array([r for _, r in pairs])
        assert np.all(ratios >= 0.0) and np.all(ratios <= 1.0)
        # budget constraint: overall ratio must be >= target
        shapes = [(3, 3, 1, 32), (3, 3, 32, 64), (3136, 1024), (1024, 10)]
        nb = np.array([np.prod(s) for s in shapes], np.float64)
        overall = np.sum(nb * ratios) / np.sum(nb)
        assert overall >= 0.5 - 0.01


def test_bisect_threshold_matches_quantile():
    """Bisection threshold hits the target sparsity on big tensors."""
    from pocketflow_tpu.learners.weight_sparsification import masking
    w = jax.random.normal(jax.random.PRNGKey(5), (512, 300))  # > _BISECT_MIN_SIZE
    assert w.size >= masking._BISECT_MIN_SIZE
    for ratio in (0.25, 0.5, 0.9):
        mask = masking.percentile_mask(w, jnp.asarray(ratio))
        sparsity = 1.0 - float(jnp.mean(mask))
        assert sparsity == pytest.approx(ratio, abs=2e-3), (ratio, sparsity)
    # threshold value itself matches the sort-based quantile closely
    mag = jnp.abs(w)
    t_bisect = float(masking.percentile_threshold_bisect(mag, jnp.asarray(0.5)))
    t_sort = float(jnp.quantile(mag.reshape(-1), 0.5))
    assert t_bisect == pytest.approx(t_sort, rel=1e-3)
