"""Per-layer pruning-ratio optimizer for weight sparsification.

Rebuild of /root/reference/learners/weight_sparsification/pr_optimizer.py:96-611.

Protocols (``--ws_prune_ratio_prtl``):
* ``uniform`` — every maskable layer gets the global target ratio (:385-392);
* ``heurist`` — ratio_i = alpha * log(#params_i), alpha chosen so the overall
  ratio hits the target (:394-409);
* ``optimal`` — DDPG agent proposes per-layer ratios; each roll-out's reward is
  the fast-finetuned pruned model's accuracy (:411-611).

TPU-first redesign of the roll-out machinery: the reference's separate
full/pruned graphs + checkpoint round-trips + rank-0 text-file sync become
pure param pytrees and three jitted programs (layerwise regression step,
global fine-tune step, fast eval step) reused across every roll-out (compile
once, shapes never change).  The reference's *sequential* per-layer regression
(20 Adam iters on layer 1, then 20 on layer 2, ...) is replaced by a *joint*
regression: inputs to every conv/dense are stop-gradient'ed, so the summed
per-layer L2 loss gives each kernel exactly its own layerwise-regression
gradient and all layers train simultaneously — 20 fused steps total instead
of 20 x L dispatches, same fixed point.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.core.metrics import get_logger
from pocketflow_tpu.learners.weight_sparsification import masking
from pocketflow_tpu.learners.capture import CapturePolicy, regression_paths_filter
from pocketflow_tpu.nn.layers import CompressionPolicy, compression
from pocketflow_tpu.rl_agents.ddpg.agent import DdpgAgent
from pocketflow_tpu.learners.weight_sparsification.rl_helper import RLHelper

FLAGS.DEFINE_string('ws_save_path', './models_ws/model.ckpt', "WS: model's save path")
FLAGS.DEFINE_float('ws_prune_ratio', 0.75, 'WS: target pruning ratio')
FLAGS.DEFINE_string('ws_prune_ratio_prtl', 'optimal',
                    "WS: pruning ratio protocol ('uniform' | 'heurist' | 'optimal')")
FLAGS.DEFINE_integer('ws_nb_rlouts', 200, 'WS: # of roll-outs for the RL agent')
FLAGS.DEFINE_integer('ws_nb_rlouts_min', 50,
                     'WS: minimal # of roll-outs for the RL agent to start training')
FLAGS.DEFINE_string('ws_reward_type', 'single-obj',
                    "WS: reward type ('single-obj' OR 'multi-obj')")
FLAGS.DEFINE_float('ws_lrn_rate_rg', 3e-2, 'WS: learning rate for layerwise regression')
FLAGS.DEFINE_integer('ws_nb_iters_rg', 20, 'WS: # of iterations for layerwise regression')
FLAGS.DEFINE_float('ws_lrn_rate_ft', 3e-4, 'WS: learning rate for global fine-tuning')
FLAGS.DEFINE_integer('ws_nb_iters_ft', 400, 'WS: # of iterations for global fine-tuning')
FLAGS.DEFINE_integer('ws_nb_iters_feval', 25, 'WS: # of iterations for fast evaluation')
FLAGS.DEFINE_float('ws_prune_ratio_exp', 3.0, "WS: pruning ratio's exponent term")
FLAGS.DEFINE_float('ws_iter_ratio_beg', 0.1, 'WS: iteration ratio (at starting time)')
FLAGS.DEFINE_float('ws_iter_ratio_end', 0.5, 'WS: iteration ratio (at ending time)')
FLAGS.DEFINE_float('ws_mask_update_step', 500, 'WS: step size for updating the pruning mask')


class PROptimizer:
    """Computes (maskable path, final prune ratio) pairs for the WS learner."""

    def __init__(self, learner):
        self.learner = learner
        self.log = get_logger()
        self.model = learner.model
        self.helper = learner.model_helper

    # ------------------------------------------------------------------

    def run(self, full_params=None, batch_stats=None) -> List[Tuple[str, float]]:
        params = full_params if full_params is not None else self._init_params()[0]
        paths = masking.maskable_paths(params)
        shapes = masking.maskable_shapes(params)
        prtl = FLAGS.ws_prune_ratio_prtl
        if prtl == 'uniform':
            pairs = [(p, float(FLAGS.ws_prune_ratio)) for p in paths]
        elif prtl == 'heurist':
            pairs = self._heurist(paths, shapes)
        elif prtl == 'optimal':
            # RL roll-outs re-mask and re-evaluate with replicated
            # device_puts — a TP sharding tree would silently mis-shard
            self.learner.require_dp_only('the optimal-protocol RL search')
            if batch_stats is None:
                batch_stats = self._init_params()[1]
            pairs = self._optimal(params, batch_stats, paths, shapes)
        else:
            raise ValueError('unrecognized WS pruning ratio protocol: ' + prtl)
        for path, ratio in pairs:
            self.log.info('%s: %f', path, ratio)
        return pairs

    def _init_params(self):
        state, _, _ = self.learner.init_state()
        restored = self.learner.restore_model(state)
        if restored is not None:
            state = restored
        return state.params, state.batch_stats

    @staticmethod
    def _heurist(paths, shapes) -> List[Tuple[str, float]]:
        nb_params = np.array([np.prod(s) for s in shapes], np.float64)
        alpha = (FLAGS.ws_prune_ratio * np.sum(nb_params)
                 / np.sum(nb_params * np.log(nb_params)))
        return [(p, float(alpha * np.log(n))) for p, n in zip(paths, nb_params)]

    # ------------------------------------------------------------------
    # 'optimal' protocol: DDPG search over per-layer ratios (:411-611)
    # ------------------------------------------------------------------

    def _optimal(self, full_params, batch_stats, paths, shapes):
        learner = self.learner
        skip_head_n_tail = learner.dataset_name in ('cifar_10', 'cifar10')
        rl_helper = RLHelper(shapes, skip_head_n_tail)
        agent = DdpgAgent(
            s_dims=rl_helper.s_dims, a_dims=1, nb_rlouts=FLAGS.ws_nb_rlouts,
            buf_size=len(paths) * FLAGS.ws_nb_rlouts_min, a_min=0.0, a_max=1.0,
            seed=FLAGS.rand_seed)
        agent.init()

        rg_step, ft_step, feval_step = self._build_rollout_programs(
            full_params, batch_stats, paths)
        # RL rewards come from a held-out split of the TRAIN set, never the
        # test set (reference datasets/abstract_dataset.py:66-76 +
        # channel_pruning/learner.py:137-142: hyper-parameter search must not
        # tune on evaluation data)
        train_iter, val_iter = learner.dataset_train.build(enbl_trn_val_split=True)

        # resume a preempted search from its latest checkpoint
        import os
        search_path = os.path.join(
            os.path.dirname(FLAGS.ws_save_path) or '.', 'ddpg_search.npz')
        reward_best, ratios_best, idx_beg = -np.inf, None, 0
        if agent.restore_search(search_path):
            extras = agent.restored_extras
            idx_beg = int(extras.get('idx_rlout', -1)) + 1
            reward_best = float(extras.get('reward_best', -np.inf))
            arr_best = extras.get('ratios_best')
            if arr_best is not None and np.size(arr_best) == len(paths):
                ratios_best = {p: float(r) for p, r in zip(paths, arr_best)}
            self.log.info('resumed WS ratio search from %s at rlout #%d',
                          search_path, idx_beg)

        for idx_rlout in range(idx_beg, FLAGS.ws_nb_rlouts):
            # 1. choose per-layer ratios with the noisy actor (:472-492)
            agent.init_rlout()
            states, actions = [], []
            for idx in range(len(paths)):
                state_vec = rl_helper.calc_state(idx)
                action = float(agent.actions_noisy(state_vec)[0, 0])
                rl_helper.cvt_action_to_prune_ratio(idx, action)
                states.append(state_vec[0])
                actions.append([action])
                agent.train()
            ratios = {p: r for p, r in zip(paths, rl_helper.prune_ratios)}

            # 2. prune + fast finetune + fast eval => reward (:494-564)
            ratios_arr = jnp.asarray(
                [ratios[p] for p in paths], jnp.float32)
            pruned, masks = None, None
            pruned, masks, opt_rg = rg_step['init'](full_params, ratios_arr)
            for _ in range(FLAGS.ws_nb_iters_rg):
                pruned, opt_rg = rg_step['step'](full_params, batch_stats,
                                                 pruned, masks, opt_rg,
                                                 next(train_iter))
            opt_ft = ft_step['init'](pruned)
            bstats = batch_stats
            for _ in range(FLAGS.ws_nb_iters_ft):
                pruned, bstats, opt_ft = ft_step['step'](pruned, bstats, masks,
                                                         opt_ft, next(train_iter))
            accs = [float(feval_step(pruned, bstats, next(val_iter)))
                    for _ in range(FLAGS.ws_nb_iters_feval)]
            reward = rl_helper.calc_reward(float(np.mean(accs)))

            # 3. record transitions & baseline (:566-582)
            nb = len(paths)
            states_np = np.asarray(states, np.float32)
            states_next = np.vstack([states_np[1:], states_np[:1]])
            terminals = np.zeros(nb); terminals[-1] = 1.0
            agent.record(states_np, np.asarray(actions, np.float32),
                         reward * np.ones(nb), terminals, states_next)
            agent.finalize_rlout(np.asarray([reward]))

            if reward > reward_best:
                reward_best = reward
                ratios_best = dict(ratios)
            self.log.info(
                'rlout #%d: reward=%.4f (best=%.4f, overall pr=%.4f)',
                idx_rlout, reward, reward_best, rl_helper.calc_overall_prune_ratio())
            if learner.is_primary_worker():
                save_ratios = ratios_best if ratios_best is not None else ratios
                agent.save_search(search_path, extras={
                    'idx_rlout': idx_rlout, 'reward_best': reward_best,
                    'ratios_best': np.asarray(
                        [save_ratios[p] for p in paths], np.float32)})

        if ratios_best is None:
            # every reward was NaN/-inf, the roll-out loop never ran
            # (ws_nb_rlouts=0 / resume past the end), or the restored best
            # failed validation: fall back like the CP search does instead
            # of crashing on a None lookup
            self.log.warning('no rollout produced a usable best ratio set; '
                             'falling back to %s',
                             'the final rollout' if 'ratios' in locals()
                             else 'uniform ws_prune_ratio')
            ratios_best = (dict(ratios) if 'ratios' in locals()
                           else {p: float(FLAGS.ws_prune_ratio)
                                 for p in paths})
        # multi-host: processes see different data shards, so roll-out
        # rewards (hence best ratios) can diverge — process 0's decision wins
        # (the collective replacement for the reference's rank-0 text files,
        # pr_optimizer.py:429-445)
        from pocketflow_tpu.core import mesh as mesh_lib
        arr = mesh_lib.broadcast_from_primary(
            jnp.asarray([ratios_best[p] for p in paths], jnp.float32))
        arr = np.asarray(jax.device_get(arr))
        return [(p, float(arr[i])) for i, p in enumerate(paths)]

    # ------------------------------------------------------------------

    def _build_rollout_programs(self, full_params, full_batch_stats, paths):
        """Three jitted programs reused across all roll-outs."""
        learner = self.learner
        model = self.model
        helper = self.helper
        augment_images = learner.dataset_train.augment_images
        augment_xy = learner.dataset_train.augment_xy
        augment_xy_eval = learner.dataset_eval.augment_xy
        model_name = helper.model_name
        tx_rg = optax.adam(FLAGS.ws_lrn_rate_rg)
        tx_ft = optax.adam(FLAGS.ws_lrn_rate_ft)
        ratio_paths = list(paths)

        # NOTE: the full-model params are explicit jit ARGUMENTS, not closure
        # constants — closures become XLA constants and the compiler tries to
        # constant-fold the quantile sorts / forward passes over them at
        # compile time (minutes per compile on big kernels).

        def full_forward_captured(fparams, fbstats, images):
            policy = CapturePolicy()
            variables = {'params': fparams, 'batch_stats': fbstats}
            with compression(policy):
                model.apply(variables, images, train=False)
            return [jax.lax.stop_gradient(a) for p, a in policy.captured
                    if regression_paths_filter(model_name, p)]

        @jax.jit
        def rollout_init(fparams, ratios_arr):
            ratios = {p: ratios_arr[i] for i, p in enumerate(ratio_paths)}
            masks = masking.masks_from_ratios(fparams, ratios)
            pruned = masking.apply_masks(fparams, masks)
            return pruned, masks, tx_rg.init(pruned)

        @jax.jit
        def rg_step(fparams, fbstats, pruned, masks, opt_state, batch):
            images = augment_images(batch, jax.random.PRNGKey(0), False)
            targets = full_forward_captured(fparams, fbstats, images)

            def loss_fn(pp):
                policy = CapturePolicy(stop_input_grads=True)
                variables = {'params': pp, 'batch_stats': fbstats}
                with compression(policy):
                    model.apply(variables, images, train=False)
                outs = [a for p, a in policy.captured
                        if regression_paths_filter(model_name, p)]
                return sum(jnp.sum(jnp.square(o.astype(jnp.float32) - t.astype(jnp.float32)))
                           for o, t in zip(outs, targets)) * 0.5

            grads = jax.grad(loss_fn)(pruned)
            # only maskable kernels train during regression (:283-314)
            grads = jax.tree_util.tree_map_with_path(
                lambda path, g, m: g * m.astype(g.dtype)
                if masking.is_maskable_path(path) else jnp.zeros_like(g),
                grads, masks)
            updates, opt_state = tx_rg.update(grads, opt_state, pruned)
            return optax.apply_updates(pruned, updates), opt_state

        @jax.jit
        def ft_init(pruned):
            return tx_ft.init(pruned)

        @jax.jit
        def ft_step(pruned, bstats, masks, opt_state, batch):  # noqa: D401
            rng = jax.random.PRNGKey(0)
            images, labels = augment_xy(batch, rng, True)

            def loss_fn(pp):
                variables = {'params': pp, 'batch_stats': bstats}
                outputs, new_mstate = helper.forward_train(model, variables, images)
                loss, _ = helper.calc_loss(labels, outputs, pp)
                return loss, new_mstate.get('batch_stats', bstats)

            grads, new_bstats = jax.grad(loss_fn, has_aux=True)(pruned)
            grads = masking.mask_gradients(grads, masks)
            updates, opt_state = tx_ft.update(grads, opt_state, pruned)
            return optax.apply_updates(pruned, updates), new_bstats, opt_state

        @jax.jit
        def feval_step(pruned, bstats, batch):
            images, labels = augment_xy_eval(batch, jax.random.PRNGKey(0), False)
            variables = {'params': pruned, 'batch_stats': bstats}
            outputs = helper.forward_eval(model, variables, images)
            _, metrics = helper.calc_loss(labels, outputs, pruned)
            return metrics['accuracy']

        return ({'init': rollout_init, 'step': rg_step},
                {'init': ft_init, 'step': ft_step},
                feval_step)
