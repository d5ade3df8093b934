"""Weight-sparsification learner (magnitude pruning with a dynamic schedule).

Rebuild of /root/reference/learners/weight_sparsification/learner.py:67-381.
The reference keeps per-kernel mask/backup TF variables and three chained
assign ops run from the host; here masks/backups live in ``TrainState.extra``
and the periodic percentile-threshold mask refresh is a ``lax.cond`` branch
*inside* the fused jitted train step — zero extra host round-trips, and the
quantile/threshold/zeroing chain is one XLA fusion on device.

Per-layer final ratios come from the PROptimizer ('uniform' | 'heurist' |
'optimal' DDPG search); the dynamic ratio follows the Zhu&Gupta schedule
between ``ws_iter_ratio_beg`` and ``ws_iter_ratio_end``.  Gradients of pruned
weights are masked so pruned positions stay exactly zero.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.learners.abstract_learner import AbstractLearner, TrainState
from pocketflow_tpu.learners.weight_sparsification import masking
from pocketflow_tpu.learners.weight_sparsification.pr_optimizer import PROptimizer


class WeightSparseLearner(AbstractLearner):
    """Weight sparsification learner."""

    def __init__(self, sm_writer, model_helper):
        super().__init__(sm_writer, model_helper)
        self.enbl_dst = FLAGS.enbl_dst
        self.helper_dst = None
        if self.enbl_dst:
            from pocketflow_tpu.learners.distillation_helper import DistillationHelper
            self.helper_dst = DistillationHelper(model_helper)
        self.var_names_n_prune_ratios: Optional[List[Tuple[str, float]]] = None

    # ------------------------------------------------------------------

    def train(self) -> TrainState:
        if (FLAGS.ws_prune_ratio_prtl == 'optimal'
                and self.var_names_n_prune_ratios is None):
            # fail before any restore/work: the RL ratio search is DP-only
            self.require_dp_only('the optimal-protocol RL search')
        state, tx, _ = self.init_state()
        state, _ = self.restore_baseline(state)  # pretrained full-prec baseline

        # per-layer final pruning ratios (learner.py:84-92)
        if self.var_names_n_prune_ratios is None:
            pr_optimizer = PROptimizer(self)
            self.var_names_n_prune_ratios = pr_optimizer.run(
                full_params=state.params, batch_stats=state.batch_stats)
        ratios_fnl = dict(self.var_names_n_prune_ratios)

        extra = jax.jit(masking.build_mask_state)(state.params)
        state = self.set_extra(state, extra)

        nb_iters = self.nb_iters_train
        upd_step = max(1, int(FLAGS.ws_mask_update_step))
        idx_beg = int(nb_iters * FLAGS.ws_iter_ratio_beg)
        idx_end = int(nb_iters * FLAGS.ws_iter_ratio_end)

        def grad_transform(grads, state):
            return masking.mask_gradients(grads, state.extra['masks'])

        def post_update(state):
            step = state.step  # post-increment step counter

            def do_prune(operand):
                params, extra = operand
                return masking.prune_update(params, extra, step, nb_iters, ratios_fnl)

            def no_prune(operand):
                return operand

            # refresh masks every upd_step while the schedule is live (the
            # reference gates on iter_ratio >= ws_iter_ratio_beg too,
            # learner.py:124-131: before idx_beg the dynamic ratio is 0 and a
            # refresh would still zero min-magnitude ties), plus one final
            # application right after idx_end (learner.py:68-78)
            live = jnp.logical_and(
                jnp.logical_and(step % upd_step == 0, step >= idx_beg),
                step <= idx_end + upd_step)
            params, extra = jax.lax.cond(
                live, do_prune, no_prune, (state.params, state.extra))
            # keep pruned positions *exactly* zero between refreshes: the SGD
            # momentum trace predates the mask and would otherwise bleed tiny
            # updates into pruned weights (the reference tolerates this drift
            # between its prune_op runs; re-masking every step is one fused
            # elementwise multiply and strictly tighter)
            params = masking.apply_masks(params, extra['masks'])
            return state.replace(params=params, extra=extra)

        loss_extra = self.helper_dst.loss_extra_fn() if self.helper_dst else None
        train_step = self.build_train_step(
            tx, loss_extra_fn=loss_extra,
            grad_transform_fn=grad_transform, post_update_fn=post_update)
        eval_step = self.build_sparse_eval_step()

        state = self.run_train_loop(
            state, train_step, save_path=FLAGS.ws_save_path,
            eval_fn=lambda s: self.run_eval_loop(s, eval_step))
        self.run_eval_loop(state, eval_step)
        return state

    def evaluate(self) -> Dict[str, float]:
        state, _, _ = self.init_state()
        extra = jax.jit(masking.build_mask_state)(state.params)
        state = self.set_extra(state, extra)
        restored = self.restore_model(state, FLAGS.ws_save_path)
        if restored is None:
            raise FileNotFoundError('no checkpoint found under ' + FLAGS.ws_save_path)
        eval_step = self.build_sparse_eval_step()
        return self.run_eval_loop(restored, eval_step)

    # ------------------------------------------------------------------

    def build_sparse_eval_step(self):
        """Eval step that also reports overall pruning ratios (learner.py:244-258)."""
        helper = self.model_helper
        model = self.model
        augment_xy = self.dataset_eval.augment_xy

        def step_fn(state: TrainState, batch):
            images, labels = augment_xy(batch, jax.random.PRNGKey(0), False)
            variables = {'params': state.params, 'batch_stats': state.batch_stats}
            outputs = helper.forward_eval(model, variables, images)
            loss, metrics = helper.calc_loss(labels, outputs, state.params)
            return {'loss': loss,
                    'pr_trn': masking.calc_prune_ratio(state.params),
                    'pr_msk': masking.calc_prune_ratio(state.params, maskable_only=True),
                    **metrics}

        state_sharding = self._state_sharding or self.repl_sharding
        return jax.jit(
            step_fn,
            in_shardings=(state_sharding, self.batch_sharding),
            out_shardings=self.repl_sharding)
