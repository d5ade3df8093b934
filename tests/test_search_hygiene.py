"""Hygiene guarantees for the RL hyper-parameter searches.

Covers three contracts the reference establishes and round-1 missed:
* searches tune on a held-out split of the TRAIN set, never the test set
  (reference datasets/abstract_dataset.py:66-76,
  channel_pruning/learner.py:137-142);
* the bit budget can never silently emit sub-bit_min layers, and an
  infeasible budget raises an explicit error;
* action-noise exploration draws FRESH noise per call (reference
  rl_agents/ddpg/agent.py:340 uses tf.random_normal per sess.run);
* long searches checkpoint themselves and resume after preemption.
"""

import os

import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def _convnet_helper():
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    return ModelHelper()


def test_bit_budget_infeasible_raises():
    from pocketflow_tpu.learners.uniform_quantization.rl_helper import RLHelper
    num_weights = [1000, 2000, 500]
    shapes = [(3, 3, 4, 8), (3, 3, 8, 16), (100, 10)]
    # budget below nb_weights * bit_min is infeasible -> explicit error
    with FLAGS.scope(uql_w_bit_min=2, uql_w_bit_max=8):
        helper = RLHelper(total_bits=sum(num_weights) * 1,
                          num_weights=num_weights, shapes=shapes)
        with pytest.raises(ValueError, match='infeasible'):
            for idx in range(3):
                helper.calc_w(np.zeros((1, 1)), idx)


def test_bit_budget_tight_last_layer_clamped_at_bit_min():
    from pocketflow_tpu.learners.uniform_quantization.rl_helper import RLHelper
    num_weights = [1000, 2000, 500]
    shapes = [(3, 3, 4, 8), (3, 3, 8, 16), (100, 10)]
    # exactly-feasible budget: every layer must land on bit_min, and the
    # last layer's forced remaining-budget assignment must not drop below it
    with FLAGS.scope(uql_w_bit_min=2, uql_w_bit_max=8):
        helper = RLHelper(total_bits=sum(num_weights) * 2,
                          num_weights=num_weights, shapes=shapes)
        bits = [float(helper.calc_w(np.full((1, 1), 6.0), idx)[0][0])
                for idx in range(3)]
    assert all(b >= 2 for b in bits), bits
    assert sum(b * n for b, n in zip(bits, num_weights)) <= sum(num_weights) * 2


def test_action_noise_is_fresh_per_call():
    from pocketflow_tpu.rl_agents.ddpg.agent import DdpgAgent
    with FLAGS.scope(ddpg_noise_type='action', ddpg_noise_std_init=0.3):
        agent = DdpgAgent(s_dims=4, a_dims=2, nb_rlouts=10, buf_size=64)
        agent.init()
        state = np.ones((1, 4), np.float32)
        a1 = agent.actions_noisy(state)
        a2 = agent.actions_noisy(state)
        a3 = agent.actions_noisy(state)
    # identical input state, but exploration noise must differ call-to-call
    assert not np.allclose(a1, a2)
    assert not np.allclose(a2, a3)
    # and stay clipped to the action range
    for a in (a1, a2, a3):
        assert np.all(a >= 0.0) and np.all(a <= 1.0)


@pytest.mark.slow
def test_ws_search_avoids_eval_set_and_resumes(tmp_path):
    """The 'optimal' WS search must (a) never touch dataset_eval, (b) write a
    search checkpoint every roll-out, and (c) resume from it without redoing
    completed roll-outs."""
    from pocketflow_tpu.learners.weight_sparsification.learner import WeightSparseLearner
    from pocketflow_tpu.learners.weight_sparsification.pr_optimizer import PROptimizer

    with FLAGS.scope(batch_size=16, nb_smpls_train=256, nb_smpls_eval=64,
                     nb_smpls_val=64, batch_size_eval=16, nb_epochs_rat=0.01,
                     lrn_rate_init=0.05, ws_prune_ratio=0.5,
                     ws_prune_ratio_prtl='optimal', ws_nb_rlouts=2,
                     ws_nb_rlouts_min=1, ws_nb_iters_rg=1, ws_nb_iters_ft=1,
                     ws_nb_iters_feval=1,
                     ws_save_path=str(tmp_path / 'models_ws' / 'model.ckpt')):
        learner = WeightSparseLearner(None, _convnet_helper())

        def _poisoned_build(*args, **kwargs):
            raise AssertionError('search read the eval set')

        learner.dataset_eval.build = _poisoned_build
        state, _, _ = learner.init_state()
        pairs = PROptimizer(learner).run(full_params=state.params,
                                         batch_stats=state.batch_stats)
        search_path = str(tmp_path / 'models_ws' / 'ddpg_search.npz')
        assert os.path.exists(search_path)
        blob = np.load(search_path)
        assert int(blob['x_idx_rlout']) == 1  # both roll-outs recorded

        # resume: all roll-outs already done -> the loop body never runs and
        # the saved best ratios are returned unchanged
        learner2 = WeightSparseLearner(None, _convnet_helper())
        learner2.dataset_eval.build = _poisoned_build
        pairs2 = PROptimizer(learner2).run(full_params=state.params,
                                           batch_stats=state.batch_stats)
        assert [p for p, _ in pairs2] == [p for p, _ in pairs]
        ratios = dict(pairs)
        for path, ratio in pairs2:
            assert ratio == pytest.approx(ratios[path], abs=1e-6)


@pytest.mark.slow
def test_ws_search_killed_mid_search_recovers(tmp_path):
    """Kill-mid-search drill (VERDICT r2 #9): a search process SIGKILL-dies
    (os._exit, no cleanup) right after its 2nd roll-out checkpoint; a fresh
    process must resume at roll-out #2 and finish the remaining roll-outs
    from the recovered agent state."""
    import subprocess
    import sys
    import textwrap

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = textwrap.dedent('''
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax; jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, %(repo)r)
        import pocketflow_tpu
        from pocketflow_tpu.config import FLAGS
        FLAGS.override(synthetic_data=True, compute_dtype="float32",
                       rand_seed=0, batch_size=16, nb_smpls_train=256,
                       nb_smpls_eval=64, nb_smpls_val=64, batch_size_eval=16,
                       nb_epochs_rat=0.01, lrn_rate_init=0.05,
                       ws_prune_ratio=0.5, ws_prune_ratio_prtl="optimal",
                       ws_nb_rlouts=4, ws_nb_rlouts_min=1, ws_nb_iters_rg=1,
                       ws_nb_iters_ft=1, ws_nb_iters_feval=1,
                       enbl_native_loader=False,
                       save_path=%(save)r, ws_save_path=%(ws_save)r,
                       log_dir=%(log)r)
        from pocketflow_tpu.learners.weight_sparsification.learner import \\
            WeightSparseLearner
        from pocketflow_tpu.learners.weight_sparsification.pr_optimizer import \\
            PROptimizer
        from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
        from pocketflow_tpu.rl_agents.ddpg.agent import DdpgAgent
        nb_saves = [0]
        orig = DdpgAgent.save_search
        def dying_save(self, path, extras=None):
            orig(self, path, extras)
            nb_saves[0] += 1
            if nb_saves[0] == 2:
                os._exit(9)    # hard death mid-search, no cleanup
        DdpgAgent.save_search = dying_save
        learner = WeightSparseLearner(None, ModelHelper())
        state, _, _ = learner.init_state()
        PROptimizer(learner).run(full_params=state.params,
                                 batch_stats=state.batch_stats)
        os._exit(1)  # must never get here
    ''') % {'repo': repo, 'save': str(tmp_path / 'models' / 'model.ckpt'),
            'ws_save': str(tmp_path / 'models_ws' / 'model.ckpt'),
            'log': str(tmp_path / 'logs')}
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    proc = subprocess.run([sys.executable, '-c', child], env=env,
                          capture_output=True, text=True, timeout=540)
    assert proc.returncode == 9, proc.stderr[-2000:]
    search_path = str(tmp_path / 'models_ws' / 'ddpg_search.npz')
    assert os.path.exists(search_path)
    assert int(np.load(search_path)['x_idx_rlout']) == 1  # died after rlout 1

    # resume in-process: must pick up at roll-out #2 and complete all 4
    from pocketflow_tpu.learners.weight_sparsification.learner import \
        WeightSparseLearner
    from pocketflow_tpu.learners.weight_sparsification.pr_optimizer import \
        PROptimizer
    with FLAGS.scope(synthetic_data=True, compute_dtype='float32',
                     rand_seed=0, batch_size=16, nb_smpls_train=256,
                     nb_smpls_eval=64, nb_smpls_val=64, batch_size_eval=16,
                     nb_epochs_rat=0.01, lrn_rate_init=0.05,
                     ws_prune_ratio=0.5, ws_prune_ratio_prtl='optimal',
                     ws_nb_rlouts=4, ws_nb_rlouts_min=1, ws_nb_iters_rg=1,
                     ws_nb_iters_ft=1, ws_nb_iters_feval=1,
                     save_path=str(tmp_path / 'models' / 'model.ckpt'),
                     ws_save_path=str(tmp_path / 'models_ws' / 'model.ckpt')):
        learner = WeightSparseLearner(None, _convnet_helper())
        state, _, _ = learner.init_state()
        pairs = PROptimizer(learner).run(full_params=state.params,
                                         batch_stats=state.batch_stats)
        assert pairs and all(0.0 <= r <= 1.0 for _, r in pairs)
    # the recovered search ran roll-outs 2..3 on top of the checkpoint
    assert int(np.load(search_path)['x_idx_rlout']) == 3
