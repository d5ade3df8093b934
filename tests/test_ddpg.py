"""DDPG agent convergence test on the Move-to-target environment.

Mirrors the reference's RL unit-test strategy (SURVEY.md §4.2 / reference
rl_agents/unit_tests/move_to_target.py): the environment has optimum total
reward 0 (start |x| <= ~17, each perfect rollout loses nothing), so a trained
agent's rollout reward must be dramatically better than a random one.
"""

import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.rl_agents.ddpg.agent import DdpgAgent
from pocketflow_tpu.rl_agents.envs import MoveToTargetEnv, PendulumEnv


def _run_rollout(env, agent, rlout_len, noisy=True, train=False):
    state = env.reset()
    rewards = []
    for _ in range(rlout_len):
        action = agent.actions_noisy(state) if noisy else agent.actions_clean(state)
        state_next, reward = env.step(action)
        if train:
            agent.record(state, action, reward, np.zeros((1, 1)), state_next)
            agent.train()
        rewards.append(float(reward))
        state = state_next
    return rewards


@pytest.mark.slow
def test_ddpg_move_to_target_converges():
    nb_rlouts, rlout_len, nb_dims = 60, 40, 2
    env = MoveToTargetEnv(nb_dims=nb_dims, seed=0)
    with FLAGS.scope(ddpg_noise_prtl='tdecy', ddpg_noise_type='param',
                     ddpg_noise_std_init=0.5, ddpg_batch_size=64):
        agent = DdpgAgent(s_dims=nb_dims, a_dims=nb_dims, nb_rlouts=nb_rlouts,
                          buf_size=rlout_len * nb_rlouts // 8,
                          a_min=-1.0, a_max=1.0, seed=0)
        agent.init()
        rewards = []
        for _ in range(nb_rlouts):
            agent.init_rlout()
            step_rewards = _run_rollout(env, agent, rlout_len, noisy=True, train=True)
            agent.finalize_rlout(step_rewards)
            rewards.append(sum(step_rewards))
        # evaluate with the clean policy
        eval_rewards = [sum(_run_rollout(env, agent, rlout_len, noisy=False))
                        for _ in range(5)]
    # optimal = 0; untrained/noisy early rollouts are typically < -40.
    assert np.mean(eval_rewards) > -12.0, (np.mean(eval_rewards), rewards[:5])


def test_ddpg_train_noop_until_buffer_full():
    with FLAGS.scope(ddpg_batch_size=4):
        agent = DdpgAgent(s_dims=2, a_dims=1, nb_rlouts=10, buf_size=16, seed=0)
        agent.init()
        assert agent.train() == (0.0, 0.0, agent.noise_spec.stdev_curr)
        for _ in range(16):
            agent.record(np.zeros((1, 2)), np.zeros((1, 1)), np.zeros((1, 1)),
                         np.zeros((1, 1)), np.ones((1, 2)))
        actor_loss, critic_loss, _ = agent.train()
        assert np.isfinite(actor_loss) and np.isfinite(critic_loss)


def test_ddpg_actions_within_bounds():
    agent = DdpgAgent(s_dims=3, a_dims=2, nb_rlouts=10, buf_size=8,
                      a_min=0.2, a_max=0.9, seed=1)
    agent.init()
    agent.init_rlout()
    acts = agent.actions_clean(np.random.randn(5, 3).astype(np.float32))
    assert acts.shape == (5, 2)
    assert acts.min() >= 0.2 and acts.max() <= 0.9


def test_noise_spec_decay():
    with FLAGS.scope(ddpg_noise_std_init=1.0, ddpg_noise_std_finl=1e-5):
        from pocketflow_tpu.rl_agents.ddpg.agent import NoiseSpec
        spec = NoiseSpec('tdecy', 100)
        for _ in range(100):
            spec.adapt()
        assert np.isclose(spec.stdev_curr, 1e-5, rtol=1e-3)


def test_pendulum_env_dynamics():
    env = PendulumEnv(seed=0)
    obs = env.reset()
    assert obs.shape == (1, 3)
    obs, reward = env.step(np.asarray([[0.5]]))
    assert obs.shape == (1, 3) and reward.shape == (1, 1)
    assert float(reward) <= 0.0


def test_adapt_noise_protocol():
    """'adapt' noise: stdev shrinks when action distance exceeds the target,
    grows when below (reference noise.py:38-60 + agent.py:345-374)."""
    with FLAGS.scope(ddpg_noise_prtl='adapt', ddpg_noise_type='param',
                     ddpg_noise_std_init=1.0, ddpg_noise_dst_finl=1e-2,
                     ddpg_noise_adpt_rat=1.05, ddpg_batch_size=8):
        agent = DdpgAgent(s_dims=3, a_dims=1, nb_rlouts=10, buf_size=16,
                          a_min=0.0, a_max=1.0, seed=0)
        agent.init()
        # fill the buffer so train() runs the adapt step
        for _ in range(20):
            s = np.random.default_rng(0).normal(size=(1, 3)).astype(np.float32)
            agent.record(s, np.zeros((1, 1)), np.zeros(1), np.zeros(1), s)
        std0 = agent.noise_spec.stdev_curr
        agent.train()
        assert agent.noise_spec.stdev_curr != std0  # adapted either way


def test_replay_buffer_ring_and_ready():
    from pocketflow_tpu.rl_agents.ddpg.replay_buffer import ReplayBuffer
    buf = ReplayBuffer(s_dims=2, a_dims=1, buf_size=8, seed=0)
    assert not buf.is_ready
    for i in range(12):  # wraps around the ring
        buf.append(np.full((1, 2), i, np.float32), np.zeros((1, 1)),
                   np.asarray([float(i)]), np.zeros(1), np.zeros((1, 2)))
    assert buf.is_ready
    batch = buf.sample(4)
    assert batch['states'].shape == (4, 2)
    # the ring keeps only the newest 8: rewards must be >= 4
    assert np.all(batch['rewards'] >= 4)


def test_agent_search_checkpoint_roundtrip(tmp_path):
    """save_search/restore_search preserve networks, buffer, noise, baseline."""
    with FLAGS.scope(ddpg_batch_size=8):
        agent = DdpgAgent(s_dims=3, a_dims=2, nb_rlouts=10, buf_size=16,
                          a_min=0.0, a_max=1.0, seed=0)
        agent.init()
        rng = np.random.default_rng(0)
        for i in range(20):
            s = rng.normal(size=(1, 3)).astype(np.float32)
            agent.record(s, rng.uniform(size=(1, 2)), np.asarray([float(i)]),
                         np.zeros(1), s)
        agent.finalize_rlout(np.asarray([0.7]))
        agent.train()
        probe = rng.normal(size=(2, 3)).astype(np.float32)
        actions_before = agent.actions_clean(probe)
        path = str(tmp_path / 'search.npz')
        agent.save_search(path)

        fresh = DdpgAgent(s_dims=3, a_dims=2, nb_rlouts=10, buf_size=16,
                          a_min=0.0, a_max=1.0, seed=99)
        assert fresh.restore_search(path)
        np.testing.assert_allclose(fresh.actions_clean(probe), actions_before,
                                   rtol=1e-6)
        assert fresh.reward_ema == agent.reward_ema
        assert fresh.memory.count == agent.memory.count
        np.testing.assert_array_equal(fresh.memory.rewards, agent.memory.rewards)
        assert not fresh.restore_search(str(tmp_path / 'missing.npz'))


def test_restore_search_survives_corrupt_checkpoint(tmp_path):
    """A truncated/corrupt search checkpoint (preemption mid-save) must
    return False (fresh start), not crash the search; saves are atomic."""
    from pocketflow_tpu.rl_agents.ddpg.agent import DdpgAgent
    agent = DdpgAgent(s_dims=3, a_dims=1, nb_rlouts=4, buf_size=16,
                      a_min=0.0, a_max=1.0, seed=0)
    agent.init()
    path = str(tmp_path / 'search.npz')
    with open(path, 'wb') as fout:
        fout.write(b'PK\x03\x04truncated-garbage')
    assert agent.restore_search(path) is False
    agent.save_search(path, extras={'idx_rlout': 1})
    assert agent.restore_search(path)
    assert int(agent.restored_extras['idx_rlout']) == 1
    # no stray tmp file left behind
    import os
    assert not [f for f in os.listdir(tmp_path) if '.tmp' in f]
