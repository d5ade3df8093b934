"""Channel-pruned learner (He et al. ICCV'17 + AMC RL search).

Rebuild of /root/reference/learners/channel_pruning/learner.py:82-701.

Modes (``--cp_prune_option``):
* ``uniform`` — every prunable conv keeps ``cp_uniform_preserve_ratio`` of its
  input channels;
* ``list``    — per-layer preserve ratios from ``cp_prune_list_file``;
* ``auto``    — AMC: a DDPG agent proposes per-layer preserve ratios under a
  global FLOPs budget (``cp_preserve_ratio``); reward = accuracy (or the
  FLOPs-regularized reward) of the pruned model (reference :593-696).

Each layer is pruned with LASSO channel selection + least-squares kernel
reconstruction (channel_pruner.py), walking layers in graph order so later
layers see the already-pruned activations — same sequential semantics as the
reference, but the per-layer solves are jitted ISTA/lstsq programs instead of
sklearn on the host.  Pruning is "fake" (masked channels stay zero); the
export tool shrinks kernels physically.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.learners.abstract_learner import AbstractLearner, TrainState
from pocketflow_tpu.learners.channel_pruning import channel_pruner as cp_lib
from pocketflow_tpu.learners.weight_sparsification import masking
from pocketflow_tpu.rl_agents.ddpg.agent import DdpgAgent

FLAGS.DEFINE_string('cp_prune_option', 'auto',
                    "CP: pruning option ('uniform' | 'list' | 'auto')")
FLAGS.DEFINE_string('cp_prune_list_file', 'ratio.list',
                    'CP: file with per-layer preserve ratios')
FLAGS.DEFINE_string('cp_channel_pruned_path', './models/pruned_model.ckpt',
                    "CP: pruned model's save path")
FLAGS.DEFINE_string('cp_best_path', './models/best_model.ckpt',
                    "CP: best pruned model's save path")
FLAGS.DEFINE_string('cp_original_path', './models/original_model.ckpt',
                    "CP: original model's save path")
FLAGS.DEFINE_float('cp_preserve_ratio', 0.5, 'CP: desired FLOPs preserve ratio')
FLAGS.DEFINE_float('cp_uniform_preserve_ratio', 0.6,
                   'CP: per-layer preserve ratio (uniform mode)')
FLAGS.DEFINE_float('cp_noise_tolerance', 0.15,
                   'CP: noise tolerance bounding the FLOPs-policy reward')
FLAGS.DEFINE_float('cp_lrn_rate_ft', 1e-4, 'CP: learning rate for global fine-tuning')
FLAGS.DEFINE_boolean('cp_finetune_schedule', False,
                     'CP: fine-tune on the model\'s full piecewise LR profile '
                     '(compressed to the fine-tune length, as CPR does) '
                     'instead of the reference\'s constant cp_lrn_rate_ft — '
                     'closes most of the reference\'s CP-vs-CPR accuracy gap')
FLAGS.DEFINE_float('cp_nb_iters_ft_ratio', 0.2,
                   'CP: ratio of total iterations for global fine-tuning')
FLAGS.DEFINE_boolean('cp_finetune', False, 'CP: finetune between list groups')
FLAGS.DEFINE_boolean('cp_retrain', False, 'CP: retrain between list groups')
FLAGS.DEFINE_integer('cp_list_group', 1000, 'CP: # of iterations for fast evaluation')
FLAGS.DEFINE_integer('cp_nb_rlouts', 200, 'CP: # of roll-outs for the RL agent')
FLAGS.DEFINE_integer('cp_nb_rlouts_min', 50,
                     'CP: min # of roll-outs before the agent trains')
FLAGS.DEFINE_string('cp_reward_policy', 'accuracy',
                    "CP: reward policy ('accuracy' | 'flops')")


class AmcRLHelper:
    """AMC states + FLOPs-budget action constraint
    (reference channel_pruner.py:108-213)."""

    def __init__(self, specs, preserve_ratio: float, ratio_min: float = 0.2):
        self.specs = specs
        self.nb_layers = len(specs)
        self.flops = np.asarray([s['flops'] for s in specs], np.float64)
        self.total_flops = float(self.flops.sum())
        self.desired_preserve = preserve_ratio * self.total_flops
        self.ratio_min = ratio_min
        # state: [idx, c_out, c_in, H, W, stride, flops, decided, rest, prev_a]
        self.s_dims = 10
        self.reset()

    def reset(self):
        self.ratios = np.ones(self.nb_layers)
        self.decided = np.zeros(self.nb_layers, bool)
        self.prev_action = 1.0

    def calc_state(self, idx: int) -> np.ndarray:
        s = self.specs[idx]
        h, w, c_in, c_out = s['kernel_shape']
        decided_flops = float(np.sum(self.flops[self.decided]
                                     * self.ratios[self.decided]))
        rest_flops = float(np.sum(self.flops[~self.decided]))
        state = np.array([
            idx / max(1, self.nb_layers - 1), c_out / 1024.0, c_in / 1024.0,
            s['out_shape'][1] / 256.0, s['out_shape'][2] / 256.0,
            s['strides'][0] / 4.0, s['flops'] / max(self.total_flops, 1.0),
            decided_flops / max(self.total_flops, 1.0),
            rest_flops / max(self.total_flops, 1.0), self.prev_action,
        ], np.float32)
        return state[None, :]

    def constrain_action(self, idx: int, action: float) -> float:
        """FLOPs budget: even pruning all later layers to ratio_min must keep
        total preserved FLOPs <= desired (reference __action_constraint)."""
        action = min(1.0, max(0.0, float(action)))
        decided_flops = float(np.sum(self.flops[self.decided]
                                     * self.ratios[self.decided]))
        later = [j for j in range(self.nb_layers)
                 if not self.decided[j] and j != idx]
        later_min = float(np.sum(self.flops[later]) * self.ratio_min)
        this = float(self.flops[idx])
        max_action = (self.desired_preserve - decided_flops - later_min) / max(this, 1.0)
        # budget cap from above, ratio_min floor from below (the AMC lbound —
        # the later_min accounting above assumes every layer keeps >= ratio_min)
        action = max(self.ratio_min, min(action, max(self.ratio_min, max_action)))
        self.ratios[idx] = action
        self.decided[idx] = True
        self.prev_action = action
        return action

    def preserved_flops(self) -> float:
        return float(np.sum(self.flops * self.ratios))

    def calc_reward(self, accuracy: float) -> float:
        if not np.isfinite(accuracy):
            accuracy = 0.0  # diverged roll-out: worst finite reward, never NaN
        if FLAGS.cp_reward_policy == 'accuracy':
            return float(accuracy)
        # reward = -max(tol, 1-acc) * log(flops) (reference learner.py:611-621)
        return float(-max(FLAGS.cp_noise_tolerance, 1.0 - accuracy)
                     * math.log(max(self.preserved_flops(), 2.0)))


def _merge_topk(candidates, reward, ratios, k: int = 5,
                min_dist: float = 0.05):
    """Keep the K best (reward, ratios) pairs, pairwise distinct (mean
    |delta-ratio| >= min_dist) so adjacent rollouts of a converged policy
    don't fill every slot with near-duplicates — a candidate too close to an
    already-kept better one is dropped."""
    merged = []
    for r, rs in sorted(candidates + [(float(reward), list(ratios))],
                        key=lambda t: -t[0]):
        vec = np.asarray(rs, np.float64)
        if any(float(np.mean(np.abs(np.asarray(kept, np.float64) - vec)))
               < min_dist for _, kept in merged):
            continue
        merged.append((r, rs))
        if len(merged) >= k:
            break
    return merged


class ChannelPrunedLearner(AbstractLearner):
    """Channel pruning learner with uniform / list / AMC-auto strategies."""

    def __init__(self, sm_writer, model_helper):
        super().__init__(sm_writer, model_helper)
        self.enbl_dst = FLAGS.enbl_dst
        self.helper_dst = None
        if self.enbl_dst:
            from pocketflow_tpu.learners.distillation_helper import DistillationHelper
            self.helper_dst = DistillationHelper(model_helper)
        self.pruner: Optional[cp_lib.ChannelPruner] = None
        self.specs = None
        # filled by search_ratios_rl: top-K distinct (reward, ratios) pairs
        self.search_topk: List[tuple] = []

    # ------------------------------------------------------------------

    def _setup_pruner(self, state: TrainState):
        # shape-only peek: build() would leak a prefetch pipeline
        sample = self.dataset_train.peek_batch(2)
        sample_images = self.dataset_train.augment_images(
            {k: jnp.asarray(v) for k, v in sample.items()},
            jax.random.PRNGKey(0), False)
        self.specs = cp_lib.conv_layer_specs(
            self.model, state.params, state.batch_stats, sample_images)
        # first conv is never pruned (its input is the image)
        self.specs = [s for s in self.specs if s['kernel_shape'][2] > 3]
        self.pruner = cp_lib.ChannelPruner(self.model, self.dataset_train, self.specs)

    def _ratio_list(self) -> List[float]:
        nb = len(self.specs)
        if FLAGS.cp_prune_option == 'uniform':
            return [FLAGS.cp_uniform_preserve_ratio] * nb
        if FLAGS.cp_prune_option == 'list':
            with open(FLAGS.cp_prune_list_file) as fin:
                text = fin.read().replace('\n', ',')
            ratios = [float(s) for s in text.split(',') if s.strip()]
            if len(ratios) != nb:
                # zip() would silently truncate and the mask builder would
                # KeyError layers the loop never visited
                raise ValueError(
                    'cp_prune_list_file has %d ratios but the model has %d '
                    'prunable conv layers' % (len(ratios), nb))
            return ratios
        raise ValueError('unexpected prune option: ' + FLAGS.cp_prune_option)

    def prune_with_ratios(self, state: TrainState,
                          ratios: List[float]) -> Tuple[TrainState, dict]:
        """Sequentially prune each conv at its preserve ratio; later layers
        sample activations from the already-pruned net (reference semantics).

        Between layer groups, ``--cp_finetune`` runs a short masked fine-tune
        on the task loss and ``--cp_retrain`` re-initializes the optimizer and
        trains longer (reference __prune_and_finetune_list, learner.py:602-609;
        group length = ``cp_list_group`` iterations).
        """
        fbstats = state.batch_stats
        params = jax.device_get(self.copy_state(state).params)
        # the ORIGINAL net stays on device for the whole prune pass: it is
        # the reconstruction target of every layer (reference feats_dict);
        # the current net is mirrored on device and only the single pruned
        # kernel is re-uploaded per layer (re-putting the whole ~100 MB tree
        # per layer per roll-out serialized ~1 TB of host->device transfer
        # over an AMC search)
        orig_dev = jax.device_put(params)
        cur_dev = jax.device_put(params)
        # one prefetching iterator + one jitted finetune step for the WHOLE
        # search: a fresh build()/jit per rollout would leak a prefetch
        # thread and recompile the step on each of the ~200 AMC roll-outs
        if getattr(self, '_cp_train_iter', None) is None:
            self._cp_train_iter = self.dataset_train.build()
        train_iter = self._cp_train_iter
        group_step = None
        if FLAGS.cp_finetune or FLAGS.cp_retrain:
            if getattr(self, '_group_ft_step', None) is None:
                self._group_ft_step = self._build_group_ft_step()
            group_step = self._group_ft_step
        chn_masks = {}
        for spec, ratio in zip(self.specs, ratios):
            path = spec['path']
            c_in = spec['kernel_shape'][2]
            if max(1, int(math.ceil(ratio * c_in))) >= c_in:
                # nothing to prune: skip the 30-batch feature collection
                chn_masks[path] = np.ones(c_in, np.float32)
                self.log.info('layer %s: kept %d/%d channels (target %.2f, '
                              'no pruning)', path, c_in, c_in, ratio)
                continue
            # X from the CURRENT (partially pruned) net, Y targets from the
            # ORIGINAL net
            X, Y = self.pruner.collect(spec, orig_dev, state.batch_stats,
                                       cur_dev, fbstats, train_iter,
                                       self.next_rng())
            kernel = params
            cur_kernel = cur_dev
            for key in path.split('/'):
                kernel = kernel[key]
                cur_kernel = cur_kernel[key]
            new_kernel, idxs = self.pruner.prune_layer(
                spec, kernel['kernel'], X, Y, ratio)
            kernel['kernel'] = np.asarray(jax.device_get(new_kernel))
            cur_kernel['kernel'] = jax.device_put(kernel['kernel'])
            chn_masks[path] = idxs.astype(np.float32)
            self.log.info('layer %s: kept %d/%d channels (target %.2f)',
                          path, int(idxs.sum()), len(idxs), ratio)
            if group_step is not None:
                params, fbstats = self._group_finetune(
                    group_step, params, fbstats, chn_masks, train_iter)
                cur_dev = jax.device_put(params)  # whole tree changed

        if jax.process_count() > 1:
            # each process sampled ITS OWN data shard: the selected channels
            # and reconstructed kernels differ per process, and device_put
            # as 'replicated' would stamp divergent host arrays as one
            # global array — broadcast the primary's results like the WS
            # optimizer does (pr_optimizer.py broadcast after search)
            from pocketflow_tpu.core import mesh as mesh_lib
            params = jax.tree_util.tree_map(
                lambda a: np.asarray(jax.device_get(
                    mesh_lib.broadcast_from_primary(jnp.asarray(a)))), params)
            fbstats = jax.tree_util.tree_map(
                lambda a: np.asarray(jax.device_get(
                    mesh_lib.broadcast_from_primary(jnp.asarray(a)))),
                jax.device_get(fbstats))
            chn_masks = {k: np.asarray(jax.device_get(
                mesh_lib.broadcast_from_primary(jnp.asarray(v))))
                for k, v in chn_masks.items()}

        def mk(path, leaf):
            pstr = masking.path_str(path)
            for spec in self.specs:
                if pstr == spec['path'] + '/kernel':
                    return jnp.asarray(
                        chn_masks[spec['path']].reshape(1, 1, -1, 1))
            return jnp.ones((), jnp.float32)

        masks = jax.tree_util.tree_map_with_path(mk, state.params)
        new_params = jax.device_put(params, self.repl_sharding)
        # the group finetune updated BN stats against the pruned kernels:
        # they must travel with the params or eval runs on stale statistics
        new_bstats = jax.device_put(jax.device_get(fbstats), self.repl_sharding)
        state = self.set_extra(
            state.replace(params=new_params, batch_stats=new_bstats),
            {'masks': masks})
        return state, state.extra['masks']

    def _build_group_ft_step(self):
        """Masked task-loss fine-tune step used between list groups."""
        import optax
        helper = self.model_helper
        model = self.model
        augment_xy = self.dataset_train.augment_xy
        tx = optax.sgd(learning_rate=FLAGS.cp_lrn_rate_ft, momentum=FLAGS.momentum)
        spec_paths = [s['path'] for s in self.specs]

        @jax.jit
        def opt_init(params):
            return tx.init(params)

        @jax.jit
        def step(params, bstats, masks, opt_state, batch, rng):
            images, labels = augment_xy(batch, rng, True)

            def loss_fn(pp):
                variables = {'params': pp, 'batch_stats': bstats}
                outputs, new_mstate = helper.forward_train(model, variables, images)
                loss, _ = helper.calc_loss(labels, outputs, pp)
                return loss, new_mstate.get('batch_stats', bstats)

            grads, new_bstats = jax.grad(loss_fn, has_aux=True)(params)
            grads = masking.mask_gradients(grads, masks)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = masking.apply_masks(params, masks)
            return params, new_bstats, opt_state

        return {'opt_init': opt_init, 'step': step, 'spec_paths': spec_paths}

    def _group_finetune(self, group_step, params, bstats, chn_masks, train_iter):
        """Run cp_list_group masked finetune iters on the partially pruned net."""
        def mk(path, leaf):
            pstr = masking.path_str(path)
            for spec in self.specs:
                if pstr == spec['path'] + '/kernel' and spec['path'] in chn_masks:
                    return jnp.asarray(chn_masks[spec['path']].reshape(1, 1, -1, 1))
            return jnp.ones((), jnp.float32)

        dev_params = jax.device_put(params)
        masks = jax.tree_util.tree_map_with_path(mk, dev_params)
        opt_state = group_step['opt_init'](dev_params)
        nb_iters = max(1, FLAGS.cp_list_group // max(1, self.nb_workers) //
                       max(1, len(self.specs)))
        rng = self.next_rng()
        for i in range(nb_iters):
            dev_params, bstats, opt_state = group_step['step'](
                dev_params, bstats, masks, opt_state, next(train_iter),
                jax.random.fold_in(rng, i))
        return jax.device_get(dev_params), bstats

    # ------------------------------------------------------------------
    # AMC auto mode (reference __prune_and_finetune_auto/__prune_rl)
    # ------------------------------------------------------------------

    def search_ratios_rl(self, state: TrainState) -> List[float]:
        rl_helper = AmcRLHelper(self.specs, FLAGS.cp_preserve_ratio)
        agent = DdpgAgent(
            s_dims=rl_helper.s_dims, a_dims=1, nb_rlouts=FLAGS.cp_nb_rlouts,
            buf_size=max(1, len(self.specs)) * max(1, FLAGS.cp_nb_rlouts_min),
            a_min=0.0, a_max=1.0, seed=FLAGS.rand_seed)
        agent.init()
        eval_step = self.build_eval_step()
        # RL rewards come from a held-out split of the TRAIN set, never the
        # test set (reference channel_pruning/learner.py:137-142 +
        # datasets/abstract_dataset.py:66-76)
        _, val_iter = self.dataset_train.build(enbl_trn_val_split=True)
        # use the whole val split (cap 12 batches): the reward is the search
        # signal AND the best-rollout selector, so estimator noise directly
        # becomes winner's-curse bias on the final ratios
        nb_feval = max(1, min(
            12, self.dataset_train.spec.nb_smpls_val // self.dataset_train.batch_size))

        # resume a preempted search from its latest checkpoint
        import os
        search_path = os.path.join(
            os.path.dirname(FLAGS.cp_best_path) or '.', 'ddpg_search.npz')
        best_reward, best_ratios, idx_beg = -np.inf, None, 0
        # top-K (reward, ratios) candidates by fast-eval reward.  The fast
        # reward is a <=12-batch val estimate (sigma ~0.015), so the argmax
        # suffers winner's curse; callers that can afford K full finetunes
        # (experiments/amc_vs_uniform.py --topk) re-rank these candidates by
        # fully-finetuned VAL accuracy instead of trusting one noisy argmax.
        top_candidates: List[tuple] = []
        if agent.restore_search(search_path):
            extras = agent.restored_extras
            idx_beg = int(extras.get('idx_rlout', -1)) + 1
            best_reward = float(extras.get('reward_best', -np.inf))
            arr_best = extras.get('ratios_best')
            if arr_best is not None and np.size(arr_best) == len(self.specs):
                best_ratios = [float(r) for r in arr_best]
            rk = extras.get('rewards_topk')
            rt = extras.get('ratios_topk')
            if rk is not None and rt is not None \
                    and np.ndim(rt) == 2 and np.shape(rt)[1] == len(self.specs):
                top_candidates = [(float(r), [float(x) for x in row])
                                  for r, row in zip(np.ravel(rk), rt)]
            self.log.info('resumed AMC ratio search from %s at rlout #%d',
                          search_path, idx_beg)

        for idx_rlout in range(idx_beg, FLAGS.cp_nb_rlouts):
            rl_helper.reset()
            agent.init_rlout()
            states, actions = [], []
            for idx in range(len(self.specs)):
                s = rl_helper.calc_state(idx)
                a = float(agent.actions_noisy(s)[0, 0])
                a = rl_helper.constrain_action(idx, a)
                states.append(s[0])
                actions.append([a])
                agent.train()
            ratios = list(rl_helper.ratios)

            pruned_state, _ = self.prune_with_ratios(state, ratios)
            accs = [float(jax.device_get(
                eval_step(pruned_state, self.put_batch(next(val_iter)))['accuracy']))
                for _ in range(nb_feval)]
            reward = rl_helper.calc_reward(float(np.mean(accs)))

            nb = len(self.specs)
            states_np = np.asarray(states, np.float32)
            states_next = np.vstack([states_np[1:], states_np[:1]])
            terminals = np.zeros(nb); terminals[-1] = 1.0
            agent.record(states_np, np.asarray(actions, np.float32),
                         reward * np.ones(nb), terminals, states_next)
            agent.finalize_rlout(np.asarray([reward]))
            if reward > best_reward:
                best_reward, best_ratios = reward, ratios
            if np.isfinite(reward):
                top_candidates = _merge_topk(top_candidates, reward, ratios)
            self.log.info(
                'rlout #%d: reward=%.4f (best=%.4f) preserve=%.3f ratios=%s',
                idx_rlout, reward, best_reward,
                rl_helper.preserved_flops() / rl_helper.total_flops,
                np.round(ratios, 3).tolist())
            if self.is_primary_worker():
                agent.save_search(search_path, extras={
                    'idx_rlout': idx_rlout, 'reward_best': best_reward,
                    'ratios_best': np.asarray(
                        best_ratios if best_ratios is not None else ratios,
                        np.float32),
                    'rewards_topk': np.asarray(
                        [r for r, _ in top_candidates], np.float32),
                    'ratios_topk': np.asarray(
                        [rs for _, rs in top_candidates], np.float32)})
        self.search_topk = list(top_candidates)
        if best_ratios is None:
            # every reward was NaN/-inf (e.g. a degenerate bf16 blow-up), or
            # a resume landed past cp_nb_rlouts with an unusable restored
            # ratio list and the loop never ran ('ratios' then unbound):
            # fall back instead of crashing the search
            self.log.warning('no rollout produced a finite best reward; '
                             'falling back to %s ratios',
                             'the final rollout' if 'ratios' in locals()
                             else 'uniform cp_preserve_ratio')
            best_ratios = (ratios if 'ratios' in locals()
                           else [FLAGS.cp_preserve_ratio] * len(self.specs))
        # multi-host: process 0's search decision wins (collective sync)
        from pocketflow_tpu.core import mesh as mesh_lib
        arr = mesh_lib.broadcast_from_primary(
            jnp.asarray(best_ratios, jnp.float32))
        return [float(r) for r in np.asarray(jax.device_get(arr))]

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    def train(self) -> TrainState:
        # the LASSO prune/search path mixes host-side kernel surgery,
        # replicated device_puts, and mid-search set_extra mutations — none
        # of which honor a TP sharding tree (the jitted programs'
        # in/out_shardings would mismatch mid-search)
        self.require_dp_only('the LASSO prune/search phase')
        state, tx, _ = self.init_state()
        state, _ = self.restore_baseline(state)
        self._setup_pruner(state)

        if FLAGS.cp_prune_option == 'auto':
            ratios = self.search_ratios_rl(state)
        else:
            ratios = self._ratio_list()
        state = self.prune_and_finetune(state, ratios)
        self.run_eval_loop(state, self.build_eval_step())
        return state

    def prune_and_finetune(self, state: TrainState,
                           ratios: List[float]) -> TrainState:
        """Prune to the given per-layer preserve ratios, then global
        fine-tune with masked grads (reference __finetune_pruned_model,
        learner.py:313-379: constant cp_lrn_rate_ft).  With
        --cp_finetune_schedule the full piecewise profile is replayed
        compressed into the fine-tune window (what CPR does; measurably
        better than the reference's constant LR).  Factored out of train()
        so searches can fully finetune several candidate ratio vectors
        (experiments/amc_vs_uniform.py --topk)."""
        state, masks = self.prune_with_ratios(state, ratios)

        import optax
        schedule, nb_iters = self.setup_lrn_rate(self.global_batch_size)
        nb_iters_ft = max(1, int(nb_iters * FLAGS.cp_nb_iters_ft_ratio))
        if FLAGS.cp_finetune_schedule:
            rate = float(nb_iters) / float(nb_iters_ft)
            lr_ft = lambda step: schedule(step * rate)
            state = state.replace(step=jnp.zeros_like(state.step))
            tx_ft = optax.sgd(learning_rate=lr_ft, momentum=FLAGS.momentum)
        else:
            tx_ft = optax.sgd(learning_rate=FLAGS.cp_lrn_rate_ft,
                              momentum=FLAGS.momentum)
        state = state.replace(opt_state=self.init_opt_state(tx_ft, state.params))

        def grad_transform(grads, state):
            return masking.mask_gradients(grads, state.extra['masks'])

        def post_update(state):
            return state.replace(params=masking.apply_masks(
                state.params, state.extra['masks']))

        loss_extra = self.helper_dst.loss_extra_fn() if self.helper_dst else None
        train_step = self.build_train_step(
            tx_ft, loss_extra_fn=loss_extra,
            grad_transform_fn=grad_transform, post_update_fn=post_update)
        eval_step = self.build_eval_step()
        state = self.run_train_loop(
            state, train_step, nb_iters=nb_iters_ft,
            save_path=FLAGS.cp_channel_pruned_path,
            eval_fn=lambda s: self.run_eval_loop(s, eval_step))
        return state

    def evaluate(self) -> Dict[str, float]:
        state, _, _ = self.init_state()
        self._setup_pruner(state)

        def mk(path, leaf):
            pstr = masking.path_str(path)
            for spec in self.specs:
                if pstr == spec['path'] + '/kernel':
                    return jnp.ones((1, 1, leaf.shape[2], 1), jnp.float32)
            return jnp.ones((), jnp.float32)

        masks = jax.tree_util.tree_map_with_path(mk, state.params)
        # set_extra keeps the TP sharding contract (train() does the same)
        state = self.set_extra(state, {'masks': masks})
        restored = self.restore_model(state, FLAGS.cp_channel_pruned_path)
        if restored is None:
            raise FileNotFoundError(
                'no checkpoint found under ' + FLAGS.cp_channel_pruned_path)
        return self.run_eval_loop(restored, self.build_eval_step())
