"""Bit-width optimizer: per-layer weight bits via DDPG under a bit budget.

Rebuild of /root/reference/learners/uniform_quantization/bit_optimizer.py:50-366.
The reference coordinates roll-outs across MPI ranks through text files
('arranged_layer_bits.txt'); here a roll-out is: set the traced bit array in
``TrainState.extra`` (no recompile), optionally fast-finetune (global and/or
layerwise), fast-eval -> reward, one DDPG update per layer.  All device work
reuses the learner's jitted programs.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import numpy as np

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.core.metrics import get_logger
from pocketflow_tpu.rl_agents.ddpg.agent import DdpgAgent
from pocketflow_tpu.learners.uniform_quantization.rl_helper import RLHelper

FLAGS.DEFINE_integer('uql_equivalent_bits', 4,
                     'UQL: equivalent compression bits for the bit budget')
FLAGS.DEFINE_integer('uql_nb_rlouts', 200, 'UQL: # of RL roll-outs')
FLAGS.DEFINE_integer('uql_w_bit_min', 2, 'UQL: minimum weight bits')
FLAGS.DEFINE_integer('uql_w_bit_max', 8, 'UQL: maximum weight bits')
FLAGS.DEFINE_integer('uql_tune_layerwise_steps', 100, 'UQL: layerwise finetune steps')
FLAGS.DEFINE_integer('uql_tune_global_steps', 2000, 'UQL: global finetune steps')
FLAGS.DEFINE_string('uql_tune_save_path', './rl_tune_models/model.ckpt',
                    'UQL: RL finetune save path')
FLAGS.DEFINE_integer('uql_tune_disp_steps', 300, 'UQL: finetune display interval')
FLAGS.DEFINE_boolean('uql_enbl_random_layers', True, 'UQL: shuffle layer order per roll-out')
FLAGS.DEFINE_boolean('uql_enbl_rl_agent', False, 'UQL: enable RL bit search')
FLAGS.DEFINE_boolean('uql_enbl_rl_global_tune', True, 'UQL: global finetune in roll-outs')
FLAGS.DEFINE_boolean('uql_enbl_rl_layerwise_tune', False, 'UQL: layerwise finetune in roll-outs')


class BitOptimizer:
    """Chooses per-layer (weight, activation) bit lists for the UQ learner.

    ``prefix`` selects the flag namespace ('uql' for uniform quantization,
    'nuql' for non-uniform) — the search logic is identical, mirroring the
    reference's duplicated bit_optimizer.py files in both learners.
    """

    def __init__(self, learner, baseline_state, prefix: str = 'uql'):
        self.learner = learner
        self.baseline_state = baseline_state
        self.statistics = learner.statistics
        self.prefix = prefix
        self.log = get_logger()
        self.total_num_weights = sum(self.statistics['num_weights'])
        self.total_bits = self.total_num_weights * self._f('equivalent_bits')

    def _f(self, name):
        return getattr(FLAGS, '%s_%s' % (self.prefix, name))

    def run(self) -> Tuple[List[int], List[int]]:
        if not self._f('enbl_rl_agent'):
            w_bits = [self._f('weight_bits')] * self.statistics['nb_matmuls']
            a_bits = [self._f('activation_bits')] * self.statistics['nb_activations']
            return w_bits, a_bits
        return self._calc_optimal_bits()

    # ------------------------------------------------------------------

    def _calc_optimal_bits(self) -> Tuple[List[int], List[int]]:
        learner = self.learner
        stats = self.statistics
        nb_layers = stats['nb_matmuls']
        fp_a_bits = [32] * stats['nb_activations']

        rl_helper = RLHelper(
            self.total_bits, stats['num_weights'], stats['weight_shapes'],
            random_layers=self._f('enbl_random_layers'), seed=FLAGS.rand_seed,
            bit_min=self._f('w_bit_min'), bit_max=self._f('w_bit_max'))
        agent = DdpgAgent(
            s_dims=rl_helper.s_dims, a_dims=1, nb_rlouts=self._f('nb_rlouts'),
            buf_size=nb_layers * max(1, self._f('nb_rlouts') // 4),
            a_min=0.0, a_max=self._f('w_bit_max') - self._f('w_bit_min'),
            seed=FLAGS.rand_seed)
        agent.init()

        import optax
        schedule, _ = learner.quant_schedule()
        tx = optax.sgd(learning_rate=schedule, momentum=FLAGS.momentum)
        train_step = learner.build_quant_train_step(tx)
        eval_step = learner.build_quant_eval_step()
        # RL rewards come from a held-out split of the TRAIN set, never the
        # test set (reference datasets/abstract_dataset.py:66-76)
        train_iter, val_iter = learner.dataset_train.build(enbl_trn_val_split=True)
        tune_steps = max(1, self._f('tune_global_steps') // learner.nb_workers)
        nb_feval = max(1, min(
            8, learner.dataset_train.spec.nb_smpls_val
            // learner.dataset_train.batch_size))

        lt_step = None
        if self._f('enbl_rl_layerwise_tune'):
            lt_step = self._build_layerwise_tune_step()
            lt_steps = max(1, self._f('tune_layerwise_steps') // learner.nb_workers)

        # resume a preempted search from its latest checkpoint
        import os
        search_path = os.path.join(
            os.path.dirname(self._f('tune_save_path')) or '.',
            'ddpg_search_%s.npz' % self.prefix)
        reward_opt, w_bits_opt, idx_beg = -np.inf, None, 0
        if agent.restore_search(search_path):
            extras = agent.restored_extras
            idx_beg = int(extras.get('idx_rlout', -1)) + 1
            reward_opt = float(extras.get('reward_best', -np.inf))
            arr_best = extras.get('w_bits_best')
            if arr_best is not None and np.size(arr_best) == nb_layers:
                w_bits_opt = [int(b) for b in arr_best]
            self.log.info('resumed bit search from %s at rlout #%d',
                          search_path, idx_beg)

        for idx_rlout in range(idx_beg, self._f('nb_rlouts')):
            # 1. propose per-layer bits (possibly visiting layers in random order)
            rl_helper.reset()
            agent.init_rlout()
            states, actions, layer_bits = [], [], np.zeros(nb_layers)
            for idx in rl_helper.layer_idxs:
                state_vec = rl_helper.calc_state(idx)
                action = agent.actions_noisy(state_vec)
                bits = rl_helper.calc_w(action, idx)
                layer_bits[idx] = bits[0][0]
                states.append(state_vec[0])
                actions.append(action[0])
            w_bit_list = [int(b) for b in layer_bits]

            # 2. fast finetune from the baseline at these bits, then fast eval
            # (copy first: the fused train step donates its input buffers and
            # the baseline must survive every roll-out)
            state = learner.set_bits(
                learner.copy_state(self.baseline_state), w_bit_list, fp_a_bits)
            if lt_step is not None:
                opt_lt = lt_step['init'](state.params)
                for _ in range(lt_steps):
                    state, opt_lt = lt_step['step'](
                        self.baseline_state.params, self.baseline_state.batch_stats,
                        state, opt_lt, next(train_iter))
            if self._f('enbl_rl_global_tune'):
                rng = jax.random.PRNGKey(FLAGS.rand_seed + idx_rlout)
                for step in range(tune_steps):
                    state, _ = train_step(state, next(train_iter),
                                          jax.random.fold_in(rng, step))
            accs = [float(jax.device_get(
                eval_step(state, next(val_iter))['accuracy']))
                for _ in range(nb_feval)]
            reward = rl_helper.calc_reward(float(np.mean(accs)))

            # 3. record + train the agent
            states_np = np.asarray(states, np.float32)
            states_next = np.vstack([states_np[1:], states_np[:1]])
            terminals = np.zeros(nb_layers); terminals[-1] = 1.0
            agent.record(states_np, np.asarray(actions, np.float32),
                         float(reward[0][0]) * np.ones(nb_layers),
                         terminals, states_next)
            agent.finalize_rlout(reward.reshape(-1))
            for _ in range(nb_layers):
                agent.train()

            if float(reward[0][0]) > reward_opt:
                reward_opt = float(reward[0][0])
                w_bits_opt = list(w_bit_list)
            self.log.info('rlout #%d: bits=%s reward=%.4f (best=%.4f)',
                          idx_rlout, w_bit_list, float(reward[0][0]), reward_opt)
            if learner.is_primary_worker():
                agent.save_search(search_path, extras={
                    'idx_rlout': idx_rlout, 'reward_best': reward_opt,
                    'w_bits_best': np.asarray(w_bits_opt, np.int32)})

        # multi-host: broadcast process 0's decision (replaces the
        # reference's arranged_layer_bits.txt + barrier sync, :159-194)
        from pocketflow_tpu.core import mesh as mesh_lib
        import jax.numpy as _jnp
        arr = mesh_lib.broadcast_from_primary(
            _jnp.asarray(w_bits_opt, _jnp.float32))
        w_bits_opt = [int(b) for b in np.asarray(jax.device_get(arr))]
        return w_bits_opt, fp_a_bits

    # ------------------------------------------------------------------

    def _build_layerwise_tune_step(self):
        """Layerwise regression of the quantized net onto the full-precision
        baseline (the reference's layerwise_tune_ops, learner.py:142-166 in
        uniform_quantization/utils.py): every conv/dense output's L2 distance
        to the baseline output, layer inputs stop-gradient'ed so each kernel
        receives its own regression gradient — one fused jitted step."""
        import optax
        from pocketflow_tpu.learners.capture import capture_forward
        learner = self.learner
        model = learner.model
        augment_images = learner.dataset_train.augment_images
        policy_fn = learner._policy_fn()
        tx = optax.adam(1e-3)

        @jax.jit
        def init(params):
            return tx.init(params)

        @jax.jit
        def step(fparams, fbstats, state, opt_state, batch):
            import jax.numpy as jnp
            images = augment_images(batch, jax.random.PRNGKey(0), False)
            targets = {p: jax.lax.stop_gradient(a) for p, a in capture_forward(
                model, {'params': fparams, 'batch_stats': fbstats}, images)}

            def loss_fn(params):
                policy = policy_fn(state)
                outs = dict(capture_forward(
                    model, {'params': params, 'batch_stats': state.batch_stats},
                    images, stop_input_grads=True, inner=policy))
                return sum(jnp.sum(jnp.square(
                    outs[p].astype(jnp.float32) - targets[p].astype(jnp.float32)))
                    for p in targets) * 0.5

            grads = jax.grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(params=params), opt_state

        return {'init': init, 'step': step}
