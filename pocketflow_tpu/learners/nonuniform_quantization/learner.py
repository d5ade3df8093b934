"""Non-uniform quantization learner (learned codebooks).

Rebuild of /root/reference/learners/nonuniform_quantization/learner.py.
Weights snap to per-layer learned codebooks (exact cluster gradients via
`jax.custom_vjp`, ops/nonuniform_quant.py) while training; the trainable set
is chosen by ``--nuql_opt_mode``:

* 'weights' — only the network weights train (codebooks frozen),
* 'cluster' — only the codebooks train (weights frozen),
* 'both'    — both train jointly.

Codebooks are initialized from the *restored* weights (quantile or uniform on
the normalized range — reference learner.py:118-135 initializes cluster vars
after the weight restore) and live in ``TrainState.extra['codebooks']``.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.learners.abstract_learner import AbstractLearner, TrainState
from pocketflow_tpu.learners.nonuniform_quantization import utils as nuq_utils
from pocketflow_tpu.learners.uniform_quantization import utils as uq_utils


class NonUniformQuantLearner(AbstractLearner):
    """Non-uniform (codebook) quantization of weights."""

    def __init__(self, sm_writer, model_helper):
        super().__init__(sm_writer, model_helper)
        self.enbl_dst = FLAGS.enbl_dst
        self.helper_dst = None
        if self.enbl_dst:
            from pocketflow_tpu.learners.distillation_helper import DistillationHelper
            self.helper_dst = DistillationHelper(model_helper)

        sample = self.dataset_train.synthesize_arrays(2)[0]
        sample = self.dataset_train.augment(
            jnp.asarray(sample[:2]), jax.random.PRNGKey(0), False)
        variables = model_helper.init_model(jax.random.PRNGKey(0), sample)
        with FLAGS.scope(uql_quantize_all_layers=FLAGS.nuql_quantize_all_layers):
            self.statistics = uq_utils.discover_quant_sites(self.model, variables, sample)

        self.optimal_w_bit_list: Optional[List[int]] = None
        self.optimal_a_bit_list: Optional[List[int]] = None

    # ------------------------------------------------------------------

    def _policy_fn(self):
        def policy_fn(state: TrainState):
            return nuq_utils.NonUniformQuantPolicy(
                state.extra['codebooks'], state.extra['a_bits'])
        return policy_fn

    def quant_schedule(self):
        from pocketflow_tpu.learners.uniform_quantization.learner import (
            quant_finetune_schedule)
        return quant_finetune_schedule(
            self.model_name, self.dataset_name,
            self.dataset_train.spec.nb_smpls_train, self.global_batch_size,
            quant_epochs=FLAGS.nuql_quant_epochs)

    def init_state_quant(self, w_bit_list=None, a_bit_list=None):
        """Init with codebooks in extra; bits fixed per call (codebook shapes
        depend on k = 2^bits, so new bit lists rebuild the extra tree)."""
        w_bits = w_bit_list if w_bit_list is not None else \
            [FLAGS.nuql_weight_bits] * self.statistics['nb_matmuls']
        a_bits = a_bit_list if a_bit_list is not None else \
            [FLAGS.nuql_activation_bits] * self.statistics['nb_activations']
        state, _, _ = self.init_state()
        extra = self._build_extra(state.params, w_bits, a_bits)
        state = state.replace(extra=extra)
        schedule, self.finetune_steps = self.quant_schedule()
        tx = optax.sgd(learning_rate=schedule, momentum=FLAGS.momentum)
        self._tx = tx
        opt_state = self.init_opt_state(tx, (state.params, state.extra['codebooks']))
        state = state.replace(opt_state=opt_state)
        return state, tx, schedule

    def _build_extra(self, params, w_bits, a_bits):
        # cache the jitted builder per bit configuration: the RL bit search
        # calls set_bits per roll-out, and a fresh jax.jit each call would
        # recompile the whole codebook-init program (Lloyd scan included)
        # even for repeated bit lists
        key = (tuple(w_bits), tuple(a_bits))
        cache = getattr(self, '_extra_builders', None)
        if cache is None:
            cache = self._extra_builders = {}
        if key not in cache:
            def build(p, _w_bits=list(w_bits), _a_bits=list(a_bits)):
                return {
                    'codebooks': nuq_utils.init_codebooks(
                        p, self.statistics['weight_paths'], _w_bits),
                    'a_bits': jnp.asarray(
                        np.asarray(_a_bits) if len(_a_bits)
                        else np.zeros(0), jnp.float32),
                }
            cache[key] = jax.jit(build, out_shardings=self.repl_sharding)
        return cache[key](params)

    def set_bits(self, state: TrainState, w_bit_list, a_bit_list) -> TrainState:
        """Re-derive codebooks from current params at new bit-widths.

        Codebook shapes depend on k = 2^bits, so the optimizer state over
        (params, codebooks) must be rebuilt too (the momentum trace for the
        old codebook shapes cannot apply to the new ones)."""
        extra = self._build_extra(state.params, w_bit_list, a_bit_list)
        # set_extra keeps the TP state-sharding contract when shapes change
        state = self.set_extra(state, extra)
        if getattr(self, '_tx', None) is not None:
            opt_state = self.init_opt_state(
                self._tx, (state.params, extra['codebooks']))
            state = state.replace(opt_state=opt_state)
        return state

    # ------------------------------------------------------------------
    # train step: params AND codebooks both receive gradients; opt_mode
    # masks one side (reference learner.py:252-274 selects trainable vars)
    # ------------------------------------------------------------------

    def build_quant_train_step(self, tx):
        helper = self.model_helper
        model = self.model
        augment_xy = self.dataset_train.augment_xy
        opt_mode = FLAGS.nuql_opt_mode
        loss_extra_fn = self.helper_dst.loss_extra_fn() if self.helper_dst else None
        policy_ctor = nuq_utils.NonUniformQuantPolicy

        def step_fn(state: TrainState, batch, rng):
            images, labels = augment_xy(batch, rng, True)

            def loss_fn(params, codebooks):
                policy = policy_ctor(codebooks, state.extra['a_bits'])
                variables = {'params': params, 'batch_stats': state.batch_stats}
                outputs, new_mstate = helper.forward_train(
                    model, variables, images, policy=policy)
                loss, metrics = helper.calc_loss(labels, outputs, params)
                if loss_extra_fn is not None:
                    extra_loss, extra_metrics = loss_extra_fn(state, outputs, images, labels)
                    loss = loss + extra_loss
                    metrics = {**metrics, **extra_metrics}
                return loss, (metrics, new_mstate.get('batch_stats', state.batch_stats))

            grads, (metrics, new_bstats) = jax.grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, state.extra['codebooks'])
            g_params, g_books = grads
            if opt_mode == 'weights':
                g_books = jax.tree_util.tree_map(jnp.zeros_like, g_books)
            elif opt_mode == 'cluster':
                g_params = jax.tree_util.tree_map(jnp.zeros_like, g_params)
            elif opt_mode != 'both':
                raise ValueError('unrecognized opt mode: ' + opt_mode)

            updates, new_opt_state = tx.update(
                (g_params, g_books), state.opt_state,
                (state.params, state.extra['codebooks']))
            new_params, new_books = optax.apply_updates(
                (state.params, state.extra['codebooks']), updates)
            return state.replace(
                step=state.step + 1, params=new_params, batch_stats=new_bstats,
                opt_state=new_opt_state,
                extra={**state.extra, 'codebooks': new_books}), dict(metrics)

        # TP contract: the state follows its (possibly TP-sharded) layout —
        # forcing repl_sharding would gather sharded params every step
        state_sharding = self._state_sharding or self.repl_sharding
        return jax.jit(
            step_fn,
            in_shardings=(state_sharding, self.batch_sharding, self.repl_sharding),
            out_shardings=(state_sharding, self.repl_sharding),
            donate_argnums=(0,))

    def build_quant_eval_step(self):
        return self.build_eval_step(policy_fn=self._policy_fn())

    def quant_statistics(self):
        return self.statistics

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    def train(self) -> TrainState:
        state, tx, _ = self.init_state_quant()
        state, restored = self.restore_baseline(state)
        if restored:  # codebooks must come from the *restored* weights
            state = state.replace(extra=self._build_extra(
                state.params,
                [FLAGS.nuql_weight_bits] * self.statistics['nb_matmuls'],
                [FLAGS.nuql_activation_bits] * self.statistics['nb_activations']))

        from pocketflow_tpu.learners.uniform_quantization.bit_optimizer import BitOptimizer
        bit_optimizer = BitOptimizer(self, state, prefix='nuql')
        self.optimal_w_bit_list, self.optimal_a_bit_list = bit_optimizer.run()
        state = self.set_bits(state, self.optimal_w_bit_list, self.optimal_a_bit_list)
        self.log.info('optimal weight bits: %s', self.optimal_w_bit_list)

        train_step = self.build_quant_train_step(tx)
        eval_step = self.build_quant_eval_step()
        state = self.run_train_loop(
            state, train_step, nb_iters=self.finetune_steps,
            save_path=FLAGS.nuql_save_quant_model_path,
            eval_fn=lambda s: self.run_eval_loop(s, eval_step))
        self.run_eval_loop(state, eval_step)
        return state

    def evaluate(self) -> Dict[str, float]:
        state, _, _ = self.init_state_quant(
            self.optimal_w_bit_list, self.optimal_a_bit_list)
        restored = self.restore_model(state, FLAGS.nuql_save_quant_model_path)
        if restored is None:
            raise FileNotFoundError(
                'no checkpoint found under ' + FLAGS.nuql_save_quant_model_path)
        return self.run_eval_loop(restored, self.build_quant_eval_step())
