"""Tests for LASSO channel selection + reconstruction (channel learner)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def test_ista_lasso_matches_sparsity():
    """ISTA solver: large alpha -> all zero; alpha=0 -> least squares."""
    from pocketflow_tpu.learners.channel_pruning.channel_pruner import make_lasso_solver
    rng = np.random.default_rng(0)
    P = rng.normal(size=(200, 16)).astype(np.float32)
    beta_true = np.zeros(16, np.float32)
    beta_true[[2, 7, 11]] = [1.5, -2.0, 0.8]
    y = P @ beta_true
    solver = make_lasso_solver(nb_iters=500)
    # alpha=0: recovers the true coefficients
    beta = np.asarray(solver(jnp.asarray(P), jnp.asarray(y), jnp.float32(0.0)))
    np.testing.assert_allclose(beta, beta_true, atol=1e-2)
    # huge alpha: everything shrinks to zero
    beta = np.asarray(solver(jnp.asarray(P), jnp.asarray(y), jnp.float32(1e5)))
    assert np.all(beta == 0.0)
    # moderate alpha: the true support dominates
    beta = np.asarray(solver(jnp.asarray(P), jnp.asarray(y), jnp.float32(10.0)))
    support = np.argsort(-np.abs(beta))[:3]
    assert set(support) == {2, 7, 11}


def test_select_channels_hits_target_count():
    from pocketflow_tpu.learners.channel_pruning.channel_pruner import (
        make_lasso_solver, select_channels)
    rng = np.random.default_rng(1)
    P = rng.normal(size=(300, 32)).astype(np.float32)
    scales = np.ones(32, np.float32) * 0.05
    scales[:8] = 2.0  # 8 strong channels
    y = (P * scales) @ np.ones(32, np.float32)
    solver = make_lasso_solver(nb_iters=400)
    idxs = select_channels(P * scales, y, c_new=8, solver=solver)
    assert 6 <= int(idxs.sum()) <= 10


def test_select_channels_degenerate_target_falls_back_to_magnitude():
    """y == 0 (collapsed upstream layer): the LASSO cannot rank channels —
    the fallback must keep the REQUESTED count by column magnitude, not
    over-prune to a single channel (which would silently smash the AMC
    FLOPs accounting)."""
    from pocketflow_tpu.learners.channel_pruning.channel_pruner import (
        make_lasso_solver, select_channels)
    rng = np.random.default_rng(2)
    P = rng.normal(size=(200, 32)).astype(np.float32)
    P[:, 16:] *= 10.0  # strongest half
    y = np.zeros(200, np.float32)
    solver = make_lasso_solver(nb_iters=200)
    idxs = select_channels(P, y, c_new=16, solver=solver)
    assert int(idxs.sum()) == 16
    assert idxs[16:].all()  # magnitude fallback picked the strong half


def test_amc_rl_helper_flops_budget():
    from pocketflow_tpu.learners.channel_pruning.learner import AmcRLHelper
    specs = [
        {'path': 'c1', 'kernel_shape': (3, 3, 16, 32), 'strides': (1, 1),
         'in_shape': (1, 16, 16, 16), 'out_shape': (1, 16, 16, 32), 'flops': 100.0},
        {'path': 'c2', 'kernel_shape': (3, 3, 32, 64), 'strides': (1, 1),
         'in_shape': (1, 16, 16, 32), 'out_shape': (1, 16, 16, 64), 'flops': 300.0},
        {'path': 'c3', 'kernel_shape': (3, 3, 64, 64), 'strides': (1, 1),
         'in_shape': (1, 8, 8, 64), 'out_shape': (1, 8, 8, 64), 'flops': 600.0},
    ]
    helper = AmcRLHelper(specs, preserve_ratio=0.5)
    # agent greedily keeps everything; constraint must cap the budget
    for idx in range(3):
        helper.calc_state(idx)
        helper.constrain_action(idx, 1.0)
    assert helper.preserved_flops() <= 0.5 * helper.total_flops + 600 * 0.01 + 1e-6 \
        or helper.preserved_flops() / helper.total_flops <= 0.65


@pytest.mark.slow
def test_channel_pruned_uniform_end_to_end(tmp_path):
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.learners.channel_pruning import ChannelPrunedLearner
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    with FLAGS.scope(batch_size=16, nb_smpls_train=480, nb_smpls_eval=128,
                     batch_size_eval=32, nb_epochs_rat=0.05, lrn_rate_init=0.05):
        FullPrecLearner(None, ModelHelper()).train()
        with FLAGS.scope(cp_prune_option='uniform', cp_uniform_preserve_ratio=0.5,
                         cp_nb_batches=4, cp_nb_points_per_layer=6,
                         cp_nb_iters_ft_ratio=0.3,
                         cp_channel_pruned_path=str(tmp_path / 'cp' / 'model.ckpt')):
            learner = ChannelPrunedLearner(None, ModelHelper())
            state = learner.train()
            k = np.asarray(jax.device_get(state.params['conv2']['kernel']))
            chn_norms = np.linalg.norm(k.transpose(2, 0, 1, 3).reshape(32, -1), axis=1)
            kept = int(np.sum(chn_norms > 0))
            assert kept <= 20, kept  # ~16 of 32 channels survive
            metrics = learner.run_eval_loop(state, learner.build_eval_step())
            assert metrics['accuracy'] > 0.5


@pytest.mark.slow
def test_channel_pruned_amc_search(tmp_path):
    """Tiny AMC search: 2 roll-outs, FLOPs budget respected, rewards from the
    train/val split (eval set poisoned), search checkpoint written."""
    import os
    from pocketflow_tpu.learners.channel_pruning import ChannelPrunedLearner
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    with FLAGS.scope(batch_size=16, nb_smpls_train=256, nb_smpls_eval=64,
                     nb_smpls_val=64, batch_size_eval=16, nb_epochs_rat=0.01,
                     lrn_rate_init=0.05, cp_prune_option='auto',
                     cp_preserve_ratio=0.5, cp_nb_rlouts=2, cp_nb_rlouts_min=1,
                     cp_nb_batches=2, cp_nb_points_per_layer=4,
                     cp_best_path=str(tmp_path / 'cp' / 'best_model.ckpt')):
        learner = ChannelPrunedLearner(None, ModelHelper())
        learner.dataset_eval.build = lambda *a, **k: (_ for _ in ()).throw(
            AssertionError('AMC search read the eval set'))
        state, _, _ = learner.init_state()
        learner._setup_pruner(state)
        ratios = learner.search_ratios_rl(state)
        assert len(ratios) == len(learner.specs)
        assert all(0.0 < r <= 1.0 for r in ratios)
        # FLOPs budget: preserved fraction over prunable convs <= target
        flops = np.array([s['flops'] for s in learner.specs])
        assert float(np.sum(flops * np.asarray(ratios))) \
            <= 0.5 * float(flops.sum()) + 1e-6
        assert os.path.exists(str(tmp_path / 'cp' / 'ddpg_search.npz'))
        # top-K candidate contract (experiments/amc_vs_uniform.py --topk):
        # candidates exist, rewards sorted desc, ratio vectors full-length,
        # and the npz checkpoint round-trips them
        assert 1 <= len(learner.search_topk) <= 5
        rewards = [r for r, _ in learner.search_topk]
        assert rewards == sorted(rewards, reverse=True)
        assert all(len(rs) == len(learner.specs)
                   for _, rs in learner.search_topk)
        blob = np.load(str(tmp_path / 'cp' / 'ddpg_search.npz'),
                       allow_pickle=True)
        assert blob['x_rewards_topk'].shape[0] == len(learner.search_topk)
        assert blob['x_ratios_topk'].shape == (
            len(learner.search_topk), len(learner.specs))


def test_merge_topk_dedupes_and_ranks():
    from pocketflow_tpu.learners.channel_pruning.learner import _merge_topk
    cands = []
    cands = _merge_topk(cands, 0.5, [0.3, 0.3, 0.3])
    cands = _merge_topk(cands, 0.7, [0.6, 0.6, 0.6])
    # near-duplicate of the 0.7 candidate with a worse reward: dropped
    cands = _merge_topk(cands, 0.6, [0.61, 0.6, 0.6])
    assert [r for r, _ in cands] == [0.7, 0.5]
    # near-duplicate with a BETTER reward replaces (kept; old one dropped)
    cands = _merge_topk(cands, 0.8, [0.62, 0.6, 0.6])
    assert [r for r, _ in cands] == [0.8, 0.5]
    # capacity cap at k
    for i in range(10):
        cands = _merge_topk(cands, 0.9 + i * 0.001,
                            [0.9 - 0.2 * i, 0.1, 0.1], k=3)
    assert len(cands) == 3


def test_patch_sampler_aligns_with_valid_padding_convs():
    """VALID-padding convs (LeNet): sampled (X, Y) pairs must satisfy the
    reconstruction identity Y == sum_c X_c * W_c (the regression the LASSO
    fits) — a padding mismatch in patch extraction breaks this silently."""
    import jax
    import jax.numpy as jnp
    from pocketflow_tpu.learners.channel_pruning import channel_pruner as cp
    from pocketflow_tpu.nets.lenet_at_cifar10 import ModelHelper

    with FLAGS.scope(batch_size=4, batch_size_eval=4, nb_smpls_train=32,
                     nb_smpls_eval=16, cp_nb_points_per_layer=6):
        helper = ModelHelper()
        model = helper.create_model()
        x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)),
                        jnp.float32)
        variables = helper.init_model(jax.random.PRNGKey(0), x)
        params = variables['params']
        bstats = variables.get('batch_stats', {})
        specs = cp.conv_layer_specs(model, params, bstats, x)
        spec = next(s for s in specs if s['path'].endswith('conv2'))
        assert spec['padding'] == 'VALID'

        pruner = cp.ChannelPruner(model, helper.build_dataset_train(), specs)
        batch = next(helper.build_dataset_train().build())
        # orig == current here: the identity must hold either way
        X, Y = pruner._sampler(spec)(params, bstats, params, bstats, batch,
                                     jax.random.PRNGKey(2))
        h, w, c_in, c_out = spec['kernel_shape']
        kernel = params
        for key in spec['path'].split('/'):
            kernel = kernel[key]
        W = np.asarray(kernel['kernel'], np.float32)  # [h, w, c_in, c_out]
        Xn = np.asarray(X, np.float32)                # [P, c_in, h, w]
        # X features are (c, kh, kw); W is (kh, kw, c, o)
        pred = np.einsum('pchw,hwco->po', Xn, W)
        Yn = np.asarray(Y, np.float32)
        np.testing.assert_allclose(pred, Yn, rtol=2e-2, atol=2e-2)

        # reconstruction targets come from the ORIGINAL net (reference
        # regresses toward the unpruned feature maps so per-layer error is
        # corrected, channel_pruner.py:610): with a perturbed 'current' net,
        # Y must still satisfy the identity against the ORIGINAL kernel
        # while X comes from the current forward
        import copy
        cur = copy.deepcopy(jax.device_get(params))
        node = cur
        for key in specs[0]['path'].split('/'):
            node = node[key]
        node['kernel'] = np.asarray(node['kernel']) * 0.5  # upstream change
        X2, Y2 = pruner._sampler(spec)(params, bstats, cur, bstats, batch,
                                       jax.random.PRNGKey(2))
        pred2 = np.einsum('pchw,hwco->po', np.asarray(X2, np.float32), W)
        # same sample positions (same rng): Y2 is the original net's output,
        # so it must NOT equal the current net's X2 @ W unless X2 == X
        np.testing.assert_allclose(np.asarray(Y2), Yn, rtol=1e-5, atol=1e-5)
        assert not np.allclose(np.asarray(X2), Xn, atol=1e-5)
        assert not np.allclose(pred2, np.asarray(Y2), atol=2e-2)


def test_cp_lasso_false_magnitude_mode():
    """--cp_lasso=False (reference channel_pruner.py:619-630): channels are
    picked by kernel magnitude and the kernel is still lstsq-reconstructed
    on the survivors."""
    from pocketflow_tpu.learners.channel_pruning.channel_pruner import ChannelPruner
    h, w, c_in, c_out = 3, 3, 8, 4
    rng = np.random.default_rng(3)
    kernel = rng.normal(size=(h, w, c_in, c_out)).astype(np.float32) * 0.05
    strong = [1, 4, 6, 7]
    kernel[:, :, strong, :] *= 50.0
    X = rng.normal(size=(64, c_in, h, w)).astype(np.float32)
    Y = np.einsum('pchw,hwco->po', X, kernel)
    pruner = ChannelPruner.__new__(ChannelPruner)
    pruner.solver = None  # magnitude mode must not touch the LASSO solver
    import logging
    pruner.log = logging.getLogger('test')
    spec = {'kernel_shape': (h, w, c_in, c_out)}
    with FLAGS.scope(cp_lasso=False):
        new_kernel, idxs = ChannelPruner.prune_layer(
            pruner, spec, jnp.asarray(kernel), X, Y, preserve_ratio=0.5)
    assert int(idxs.sum()) == 4
    assert sorted(np.nonzero(idxs)[0].tolist()) == strong
    # reconstruction keeps the layer output close on the sampled data
    Yp = np.einsum('pchw,hwco->po', X, np.asarray(new_kernel))
    rel = np.linalg.norm(Yp - Y) / np.linalg.norm(Y)
    assert rel < 0.35
