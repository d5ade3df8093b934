"""DDPG agent in JAX (rebuild of /root/reference/rl_agents/ddpg/agent.py:119-418).

Same algorithm & hyper-parameter surface (ddpg_* flags), functional internals:

* actor/critic = MLPs (depth x width dense+LayerNorm+relu blocks,
  actor_critic.py:78-154), actions sigmoid-squashed to [a_min, a_max];
* target networks with Polyak tau updates;
* parameter noise (perturbed actor copy; 'adapt' protocol measures the
  action distance with a secondary perturbed copy, agent.py:345-374) or
  additive action noise; noise std follows AdaptiveNoiseSpec /
  TimeDecayNoiseSpec (noise.py:38-86);
* reward baseline = EMA subtracted from replayed rewards (agent.py:179-194);
* host-side NumPy ring replay buffer, train only when full.

The actor+critic update is ONE jitted step; everything lives in a `DdpgState`
pytree, so the whole agent is checkpointable/deterministic.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.rl_agents.ddpg.replay_buffer import ReplayBuffer

# ddpg_* flags (names & defaults mirror the reference)
FLAGS.DEFINE_float('ddpg_tau', 0.01, "DDPG: target networks' update coefficient")
FLAGS.DEFINE_float('ddpg_gamma', 0.9, 'DDPG: reward discounting factor')
FLAGS.DEFINE_float('ddpg_lrn_rate', 1e-3, "DDPG: actor & critic networks' learning rate")
FLAGS.DEFINE_float('ddpg_loss_w_dcy', 0.0, 'DDPG: weight decaying coefficient')
FLAGS.DEFINE_integer('ddpg_record_step', 1, 'DDPG: recording step size')
FLAGS.DEFINE_integer('ddpg_batch_size', 64, 'DDPG: batch size')
FLAGS.DEFINE_boolean('ddpg_enbl_bsln_func', True, 'DDPG: enable baseline function')
FLAGS.DEFINE_float('ddpg_bsln_decy_rate', 0.95, "DDPG: baseline function's decaying rate")
FLAGS.DEFINE_integer('ddpg_actor_depth', 2, "DDPG: actor network's depth")
FLAGS.DEFINE_integer('ddpg_actor_width', 64, "DDPG: actor network's width")
FLAGS.DEFINE_integer('ddpg_critic_depth', 2, "DDPG: critic network's depth")
FLAGS.DEFINE_integer('ddpg_critic_width', 64, "DDPG: critic network's width")
FLAGS.DEFINE_string('ddpg_noise_type', 'param', "DDPG: noise type ('param' | 'action')")
FLAGS.DEFINE_string('ddpg_noise_prtl', 'tdecy', "DDPG: noise protocol ('tdecy' | 'adapt')")
FLAGS.DEFINE_float('ddpg_noise_std_init', 1e+0, "DDPG: noise's initial stdev")
FLAGS.DEFINE_float('ddpg_noise_dst_finl', 1e-2, "DDPG: action noise's final distance (adapt)")
FLAGS.DEFINE_float('ddpg_noise_adpt_rat', 1.03, "DDPG: parameter noise's adaption rate")
FLAGS.DEFINE_float('ddpg_noise_std_finl', 1e-5, "DDPG: noise's final stdev (tdecy)")
FLAGS.DEFINE_float('ddpg_rms_eps', 1e-4, "DDPG: running std's epsilon")


class _MLPBlockStack(nn.Module):
    depth: int
    width: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = nn.Dense(self.width, name='dense_%d' % i)(x)
            x = nn.LayerNorm(name='ln_%d' % i)(x)
            x = nn.relu(x)
        return x


class Actor(nn.Module):
    a_dims: int
    a_min: float
    a_max: float

    @nn.compact
    def __call__(self, states):
        x = _MLPBlockStack(FLAGS.ddpg_actor_depth, FLAGS.ddpg_actor_width, name='blocks')(states)
        x = nn.Dense(self.a_dims, name='head')(x)
        return jax.nn.sigmoid(x) * (self.a_max - self.a_min) + self.a_min


class Critic(nn.Module):
    @nn.compact
    def __call__(self, states, actions):
        x = nn.Dense(FLAGS.ddpg_critic_width, name='dense_in')(states)
        x = nn.LayerNorm(name='ln_in')(x)
        x = nn.relu(x)
        x = jnp.concatenate([x, actions], axis=1)
        x = _MLPBlockStack(FLAGS.ddpg_critic_depth, FLAGS.ddpg_critic_width, name='blocks')(x)
        return nn.Dense(1, name='head')(x)


@struct.dataclass
class DdpgState:
    actor: Any
    critic: Any
    actor_tr: Any
    critic_tr: Any
    actor_perturbed: Any       # primary noisy actor (param noise)
    opt_actor: Any
    opt_critic: Any
    rng: jax.Array


class NoiseSpec:
    """AdaptiveNoiseSpec / TimeDecayNoiseSpec (noise.py:38-86)."""

    def __init__(self, protocol: str, nb_rlouts: int):
        self.protocol = protocol
        self.decy_rat = (FLAGS.ddpg_noise_std_finl / FLAGS.ddpg_noise_std_init) \
            ** (1.0 / max(nb_rlouts, 1))
        self.reset()

    def reset(self):
        self.stdev_curr = FLAGS.ddpg_noise_std_init

    def adapt(self, dst_curr: Optional[float] = None):
        if self.protocol == 'tdecy':
            self.stdev_curr *= self.decy_rat
        elif self.protocol == 'adapt':
            if dst_curr > FLAGS.ddpg_noise_dst_finl:
                self.stdev_curr /= FLAGS.ddpg_noise_adpt_rat
            else:
                self.stdev_curr *= FLAGS.ddpg_noise_adpt_rat


class DdpgAgent:
    """DDPG agent; host API mirrors the reference's Agent."""

    def __init__(self, s_dims: int, a_dims: int, nb_rlouts: int, buf_size: int,
                 a_min: float = 0.0, a_max: float = 1.0, seed: int = 0):
        self.s_dims, self.a_dims = s_dims, a_dims
        self.a_min, self.a_max = float(a_min), float(a_max)
        self.nb_rlouts = nb_rlouts
        self.buf_size = buf_size
        self.seed = seed
        self.actor_net = Actor(a_dims, self.a_min, self.a_max)
        self.critic_net = Critic()
        self.memory = ReplayBuffer(s_dims, a_dims, buf_size, seed)
        self.noise_spec = NoiseSpec(FLAGS.ddpg_noise_prtl, nb_rlouts)
        self.reward_ema: Optional[float] = None
        self.in_explore = True
        self._tx = optax.adam(FLAGS.ddpg_lrn_rate)
        self._build_jits()
        self.state: Optional[DdpgState] = None
        self.restored_extras: Dict[str, Any] = {}

    # ------------------------------------------------------------------
    # jitted programs
    # ------------------------------------------------------------------

    def _build_jits(self):
        actor_net, critic_net, tx = self.actor_net, self.critic_net, self._tx
        gamma = FLAGS.ddpg_gamma
        tau = FLAGS.ddpg_tau
        w_dcy = FLAGS.ddpg_loss_w_dcy

        def init_fn(rng):
            ks = jax.random.split(rng, 4)
            s0 = jnp.zeros((1, self.s_dims), jnp.float32)
            a0 = jnp.zeros((1, self.a_dims), jnp.float32)
            actor = actor_net.init(ks[0], s0)['params']
            critic = critic_net.init(ks[1], s0, a0)['params']
            return DdpgState(
                actor=actor, critic=critic,
                actor_tr=actor, critic_tr=critic,
                actor_perturbed=actor,
                opt_actor=tx.init(actor), opt_critic=tx.init(critic),
                rng=ks[2])

        self._init = jax.jit(init_fn)

        def perturb(params, rng, stdev):
            leaves, treedef = jax.tree_util.tree_flatten(params)
            keys = jax.random.split(rng, len(leaves))
            noisy = [leaf + stdev * jax.random.normal(k, leaf.shape, leaf.dtype)
                     for leaf, k in zip(leaves, keys)]
            return jax.tree_util.tree_unflatten(treedef, noisy)

        def perturb_fn(state, stdev):
            rng, k = jax.random.split(state.rng)
            return state.replace(
                actor_perturbed=perturb(state.actor, k, stdev), rng=rng)

        self._perturb = jax.jit(perturb_fn)

        def action_dist_fn(state, states, stdev):
            """Distance between clean and freshly-perturbed actions (adapt)."""
            rng, k = jax.random.split(state.rng)
            noisy_params = perturb(state.actor, k, stdev)
            clean = actor_net.apply({'params': state.actor}, states)
            noisy = actor_net.apply({'params': noisy_params}, states)
            return jnp.sqrt(jnp.mean(jnp.square(clean - noisy))), state.replace(rng=rng)

        self._action_dist = jax.jit(action_dist_fn)

        def act_clean(state, states):
            return actor_net.apply({'params': state.actor}, states)

        def act_noisy(state, states, stdev):
            if FLAGS.ddpg_noise_type == 'param':
                return actor_net.apply({'params': state.actor_perturbed}, states), state
            # fresh noise per call (reference draws tf.random_normal each
            # sess.run, agent.py:340): split the state rng so repeated calls
            # never reuse a key
            rng, k = jax.random.split(state.rng)
            clean = actor_net.apply({'params': state.actor}, states)
            noisy = clean + stdev * jax.random.normal(k, clean.shape)
            return jnp.clip(noisy, self.a_min, self.a_max), state.replace(rng=rng)

        self._act_clean = jax.jit(act_clean)
        self._act_noisy = jax.jit(act_noisy)

        def train_fn(state, batch):
            states, actions = batch['states'], batch['actions']
            rewards, terminals = batch['rewards'], batch['terminals']
            states_next = batch['states_next']

            a_next = actor_net.apply({'params': state.actor_tr}, states_next)
            q_next = critic_net.apply({'params': state.critic_tr}, states_next, a_next)
            target_q = rewards + (1.0 - terminals) * gamma * q_next

            def critic_loss_fn(critic):
                q = critic_net.apply({'params': critic}, states, actions)
                loss = jnp.mean(jnp.square(q - jax.lax.stop_gradient(target_q)))
                if w_dcy > 0:
                    loss = loss + w_dcy * sum(
                        jnp.sum(jnp.square(p)) for p in jax.tree_util.tree_leaves(critic))
                return loss

            def actor_loss_fn(actor):
                a = actor_net.apply({'params': actor}, states)
                q = critic_net.apply({'params': state.critic}, states, a)
                loss = -jnp.mean(q)
                if w_dcy > 0:
                    loss = loss + w_dcy * sum(
                        jnp.sum(jnp.square(p)) for p in jax.tree_util.tree_leaves(actor))
                return loss

            critic_loss, g_critic = jax.value_and_grad(critic_loss_fn)(state.critic)
            actor_loss, g_actor = jax.value_and_grad(actor_loss_fn)(state.actor)
            up_c, opt_critic = tx.update(g_critic, state.opt_critic, state.critic)
            up_a, opt_actor = tx.update(g_actor, state.opt_actor, state.actor)
            critic = optax.apply_updates(state.critic, up_c)
            actor = optax.apply_updates(state.actor, up_a)
            polyak = lambda new, tr: jax.tree_util.tree_map(
                lambda n, t: tau * n + (1.0 - tau) * t, new, tr)
            state = state.replace(
                actor=actor, critic=critic,
                actor_tr=polyak(actor, state.actor_tr),
                critic_tr=polyak(critic, state.critic_tr),
                opt_actor=opt_actor, opt_critic=opt_critic)
            return state, actor_loss, critic_loss, jnp.mean(target_q)

        self._train = jax.jit(train_fn)

    # ------------------------------------------------------------------
    # host API (mirrors reference Agent)
    # ------------------------------------------------------------------

    def init(self):
        """Initialize networks, reset buffer/noise (reference :142-157)."""
        self.state = self._init(jax.random.PRNGKey(self.seed))
        self.memory.reset()
        self.noise_spec.reset()
        self.reward_ema = None
        self.in_explore = True

    def init_rlout(self):
        """Refresh noise for the upcoming roll-out (reference :159-177)."""
        if FLAGS.ddpg_noise_prtl == 'tdecy' and not self.in_explore:
            self.noise_spec.adapt()
        if FLAGS.ddpg_noise_type == 'param':
            self.state = self._perturb(self.state, self.noise_spec.stdev_curr)

    def actions_noisy(self, states: np.ndarray) -> np.ndarray:
        states = np.atleast_2d(np.asarray(states, np.float32))
        actions, self.state = self._act_noisy(
            self.state, states, self.noise_spec.stdev_curr)
        return np.asarray(actions)

    def actions_clean(self, states: np.ndarray) -> np.ndarray:
        states = np.atleast_2d(np.asarray(states, np.float32))
        return np.asarray(self._act_clean(self.state, states))

    def record(self, states, actions, rewards, terminals, states_next):
        """Append transitions (reference :197-214)."""
        step = FLAGS.ddpg_record_step
        self.memory.append(np.atleast_2d(states)[::step],
                           np.atleast_2d(actions)[::step],
                           np.asarray(rewards).reshape(-1)[::step],
                           np.asarray(terminals).reshape(-1)[::step],
                           np.atleast_2d(states_next)[::step])

    def finalize_rlout(self, rewards):
        """Update the reward-EMA baseline (reference :179-194)."""
        if not FLAGS.ddpg_enbl_bsln_func:
            return
        mean_r = float(np.mean(rewards))
        if self.reward_ema is None:
            self.reward_ema = mean_r
        else:
            decay = FLAGS.ddpg_bsln_decy_rate
            self.reward_ema = decay * self.reward_ema + (1.0 - decay) * mean_r

    def save_search(self, path: str, extras: Optional[Dict[str, Any]] = None):
        """Checkpoint the whole search state (networks, optimizer, replay
        buffer, noise/baseline) so long RL searches survive preemption —
        SURVEY.md §5.3: the reference restarts any failed search from scratch.

        `extras` are caller-owned numpy-able values (roll-out index, best
        reward/ratios...) round-tripped verbatim; restore_search exposes them
        as `self.restored_extras`."""
        import os
        from flax import serialization
        os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
        extras = {('x_' + k): np.asarray(v) for k, v in (extras or {}).items()}
        blob = {
            **extras,
            'state': serialization.to_bytes(jax.device_get(self.state)),
            'reward_ema': -1e30 if self.reward_ema is None else self.reward_ema,
            'stdev_curr': self.noise_spec.stdev_curr,
            'in_explore': self.in_explore,
        }
        # atomic write (tmp + rename, like core/checkpoint.py): a preemption
        # mid-save must never leave a truncated file that bricks the resume
        if not path.endswith('.npz'):
            path = path + '.npz'
        tmp_path = path + '.tmp.npz'
        np.savez(tmp_path,
                 buf_states=self.memory.states, buf_actions=self.memory.actions,
                 buf_rewards=self.memory.rewards, buf_terminals=self.memory.terminals,
                 buf_states_next=self.memory.states_next,
                 buf_head=self.memory.head, buf_count=self.memory.count,
                 **{k: np.frombuffer(v, np.uint8) if isinstance(v, bytes) else v
                    for k, v in blob.items()})
        os.replace(tmp_path, path)

    def restore_search(self, path: str) -> bool:
        """Restore a checkpoint written by save_search; returns success."""
        import os
        from flax import serialization
        if not path.endswith('.npz'):
            path = path + '.npz'
        if not os.path.exists(path):
            return False
        if self.state is None:
            self.init()
        try:
            # read and decode EVERYTHING into locals before touching self:
            # truncated .npz files often pass np.load (zip directory intact)
            # and only fail with CRC/KeyError on entry access, and a changed
            # buf_size raises on broadcast — all must hit the start-fresh
            # fallback, not crash the resume, and must not leave the agent
            # half-restored
            blob = np.load(path)
            extras = {k[2:]: blob[k] for k in blob.files if k.startswith('x_')}
            new_state = serialization.from_bytes(
                self.state, blob['state'].tobytes())
            ema = float(blob['reward_ema'])
            stdev_curr = float(blob['stdev_curr'])
            in_explore = bool(blob['in_explore'])
            bufs = {k: np.array(blob['buf_' + k]) for k in
                    ('states', 'actions', 'rewards', 'terminals',
                     'states_next')}
            for k, arr in bufs.items():
                if arr.shape != getattr(self.memory, k).shape:
                    raise ValueError(
                        'replay buffer %s shape %s != current %s (flag '
                        'change between runs?)' % (k, arr.shape,
                                                   getattr(self.memory, k).shape))
            head, count = int(blob['buf_head']), int(blob['buf_count'])
        except Exception as exc:  # corrupt/truncated/mismatched: start fresh
            from pocketflow_tpu.core.metrics import get_logger
            get_logger().warning('search checkpoint %s unreadable (%s); '
                                 'starting the search from scratch', path, exc)
            return False
        self.restored_extras = extras
        self.state = new_state
        self.reward_ema = None if ema <= -1e29 else ema
        self.noise_spec.stdev_curr = stdev_curr
        self.in_explore = in_explore
        for k, arr in bufs.items():
            getattr(self.memory, k)[:] = arr
        self.memory.head = head
        self.memory.count = count
        return True

    def train(self) -> Tuple[float, float, float]:
        """One (or zero) update step; returns (actor_loss, critic_loss, stdev)."""
        if not self.memory.is_ready:
            return 0.0, 0.0, self.noise_spec.stdev_curr
        self.in_explore = False
        if FLAGS.ddpg_noise_prtl == 'adapt':
            mbatch = self.memory.sample(FLAGS.ddpg_batch_size)
            dist, self.state = self._action_dist(
                self.state, mbatch['states'], self.noise_spec.stdev_curr)
            self.noise_spec.adapt(float(dist))
        mbatch = self.memory.sample(FLAGS.ddpg_batch_size)
        if FLAGS.ddpg_enbl_bsln_func and self.reward_ema is not None:
            mbatch['rewards'] = mbatch['rewards'] - self.reward_ema
        self.state, actor_loss, critic_loss, _ = self._train(self.state, mbatch)
        return float(actor_loss), float(critic_loss), self.noise_spec.stdev_curr
