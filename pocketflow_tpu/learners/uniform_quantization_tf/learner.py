"""Deployment-grade QAT learner ('uniform-tf'): 8/8 bits, moving-average
activation ranges, quant delay, BN-freeze delay.

Rebuild of /root/reference/learners/uniform_quantization_tf/learner.py:64-368.
The reference calls `tf.contrib.quantize.experimental_create_training_graph`
(C++ graph-rewrite passes) and then repeatedly exports TFLite models, parsing
toco's error text to find unquantized activations and patching
MovingAvgQuantize nodes in (utils.py:226-295).  None of that machinery is
needed here: the same quantization semantics are a policy in the forward
trace —

* weights: per-output-channel min/max fake-quant at ``uqtf_weight_bits``;
* activations: fake-quant against an exponential-moving-average (min, max)
  range per activation site (the MovingAvgQuantize analogue), stored in
  ``TrainState.extra`` and updated inside the fused train step;
* ``uqtf_quant_delay``: quantization switches on after N steps (lax.cond);
* ``uqtf_freeze_bn_delay``: after N steps the train step swaps to a variant
  whose BN uses the frozen running statistics (two compiled programs, the
  host loop flips between them).

This learner is the one behind the published 8-bit accuracy tables
(BASELINE.md) — activation-range EMA + BN freeze is what makes deployed
int8 models match training-time numbers.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.learners.abstract_learner import AbstractLearner, TrainState
from pocketflow_tpu.learners.uniform_quantization import utils as uq_utils
from pocketflow_tpu.learners.uniform_quantization.learner import (
    quant_finetune_schedule)
from pocketflow_tpu.nn.layers import CompressionPolicy
from pocketflow_tpu.ops import fake_quant as fq

FLAGS.DEFINE_string('uqtf_save_path', './models_uqtf/model.ckpt',
                    "UQ-TF: model's save path")
FLAGS.DEFINE_string('uqtf_save_path_eval', './models_uqtf_eval/model.ckpt',
                    "UQ-TF: model's save path for evaluation")
FLAGS.DEFINE_integer('uqtf_weight_bits', 8, 'UQ-TF: # of bits for weight quantization')
FLAGS.DEFINE_integer('uqtf_activation_bits', 8,
                     'UQ-TF: # of bits for activation quantization')
FLAGS.DEFINE_integer('uqtf_quant_delay', 0,
                     'UQ-TF: # of steps after which quantization starts')
FLAGS.DEFINE_integer('uqtf_freeze_bn_delay', None,
                     'UQ-TF: # of steps after which BN statistics freeze')
FLAGS.DEFINE_float('uqtf_lrn_rate_dcy', 1.0,
                   "UQ-TF: finetune learning-rate scale factor (the reference "
                   "multiplies its BASE model LR by this, default 1e-2; here "
                   "the quant finetune schedule already encodes the decayed "
                   "rate, so 1.0 reproduces the recipe and other values "
                   "rescale it)")
FLAGS.DEFINE_boolean('uqtf_enbl_manual_quant', False,
                     'UQ-TF: manually insert activation quant sites '
                     '(always on here: the policy reaches every relu)')
FLAGS.DEFINE_float('uqtf_ema_decay', 0.999, 'UQ-TF: activation-range EMA decay')


class RangeQuantPolicy(CompressionPolicy):
    """Quantizes weights per-channel and activations against EMA ranges;
    records each site's batch min/max for the EMA update."""

    def __init__(self, weight_paths, act_min, act_max, enabled,
                 w_bits=None, a_bits=None):
        self.w_index = {p: i for i, p in enumerate(weight_paths)}
        self.act_min = act_min
        self.act_max = act_max
        self.enabled = enabled  # traced bool (step >= quant_delay)
        # explicit bit widths make exported specs self-contained: deployment
        # export must quantize at the TRAINED widths even if the flags differ
        # in the exporting process
        self.w_bits = float(w_bits if w_bits is not None
                            else FLAGS.uqtf_weight_bits)
        self.a_bits = float(a_bits if a_bits is not None
                            else FLAGS.uqtf_activation_bits)
        self.batch_ranges: List[Tuple[int, jax.Array, jax.Array]] = []

    def reset_trace(self):
        super().reset_trace()
        self.batch_ranges = []

    def process_weight(self, path, kernel):
        if path not in self.w_index:
            return kernel
        q = fq.fake_quant_channel_bucket(
            kernel, jnp.asarray(self.w_bits, jnp.float32))
        return jnp.where(self.enabled, q, kernel)

    def process_act(self, path, act):
        if not path.startswith('act/') or self.act_min.shape[0] == 0:
            return act
        idx = int(path.split('/')[1])
        bmin = jnp.min(act.astype(jnp.float32))
        bmax = jnp.max(act.astype(jnp.float32))
        self.batch_ranges.append((idx, bmin, bmax))
        q = fq.fake_quant_with_range(
            act, self.act_min[idx], self.act_max[idx],
            jnp.asarray(self.a_bits, jnp.float32))
        return jnp.where(self.enabled, q, act)


class UniformQuantTFLearner(AbstractLearner):
    """8/8 QAT with EMA activation ranges + quant/BN-freeze delays."""

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
        with FLAGS.scope(uql_quantize_all_layers=True):  # TF rewrites all layers
            self.statistics = uq_utils.discover_quant_sites(self.model, variables, sample)

    # ------------------------------------------------------------------

    def init_state_quant(self):
        nb_acts = self.statistics['nb_activations']
        extra = {'act_min': jnp.zeros(nb_acts, jnp.float32),
                 'act_max': jnp.full(nb_acts, 6.0, jnp.float32)}
        state, _, _ = self.init_state(extra=extra)
        base, self.finetune_steps = quant_finetune_schedule(
            self.model_name, self.dataset_name,
            self.dataset_train.spec.nb_smpls_train, self.global_batch_size)
        # the reference multiplies its base model LR by uqtf_lrn_rate_dcy
        # (learner.py:215); here the quant finetune schedule already encodes
        # the decayed rate, so the factor defaults to 1.0 and rescales the
        # whole finetune schedule when set
        dcy = float(FLAGS.uqtf_lrn_rate_dcy)
        schedule = base if dcy == 1.0 else (lambda step: base(step) * dcy)
        tx = optax.sgd(learning_rate=schedule, momentum=FLAGS.momentum)
        state = state.replace(opt_state=self.init_opt_state(tx, state.params))
        return state, tx, schedule

    def build_qat_train_step(self, tx, freeze_bn: bool):
        helper = self.model_helper
        model = self.model
        augment_xy = self.dataset_train.augment_xy
        weight_paths = self.statistics['weight_paths']
        ema = FLAGS.uqtf_ema_decay
        quant_delay = FLAGS.uqtf_quant_delay
        loss_extra_fn = self.helper_dst.loss_extra_fn() if self.helper_dst else None

        def step_fn(state: TrainState, batch, rng):
            images, labels = augment_xy(batch, rng, True)
            enabled = state.step >= quant_delay

            def loss_fn(params):
                policy = RangeQuantPolicy(
                    weight_paths, state.extra['act_min'],
                    state.extra['act_max'], enabled)
                variables = {'params': params, 'batch_stats': state.batch_stats}
                if freeze_bn:
                    outputs = helper.forward_eval(model, variables, images,
                                                  policy=policy)
                    new_bstats = state.batch_stats
                else:
                    outputs, new_mstate = helper.forward_train(
                        model, variables, images, policy=policy)
                    new_bstats = new_mstate.get('batch_stats', state.batch_stats)
                loss, metrics = helper.calc_loss(labels, outputs, params)
                if loss_extra_fn is not None:
                    extra_loss, extra_metrics = loss_extra_fn(state, outputs,
                                                              images, labels)
                    loss = loss + extra_loss
                    metrics = {**metrics, **extra_metrics}
                return loss, (metrics, new_bstats, policy.batch_ranges)

            grads, (metrics, new_bstats, ranges) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            # EMA range update (MovingAvgQuantize semantics)
            act_min, act_max = state.extra['act_min'], state.extra['act_max']
            for idx, bmin, bmax in ranges:
                act_min = act_min.at[idx].set(ema * act_min[idx] + (1 - ema) * bmin)
                act_max = act_max.at[idx].set(ema * act_max[idx] + (1 - ema) * bmax)
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            state = state.replace(
                step=state.step + 1, params=new_params, batch_stats=new_bstats,
                opt_state=new_opt_state,
                extra={'act_min': act_min, 'act_max': act_max})
            return state, dict(metrics)

        # TP contract: follow the state's (possibly TP-sharded) layout like
        # every other learner's train step
        state_sharding = self._state_sharding or self.repl_sharding
        return jax.jit(
            step_fn,
            in_shardings=(state_sharding, self.batch_sharding, self.repl_sharding),
            out_shardings=(state_sharding, self.repl_sharding),
            donate_argnums=(0,))

    def build_qat_eval_step(self):
        weight_paths = self.statistics['weight_paths']

        def policy_fn(state: TrainState):
            return RangeQuantPolicy(
                weight_paths, state.extra['act_min'], state.extra['act_max'],
                jnp.asarray(True))

        return self.build_eval_step(policy_fn=policy_fn)

    # ------------------------------------------------------------------

    def train(self) -> TrainState:
        state, tx, _ = self.init_state_quant()
        # resume from this learner's own checkpoints first (a preempted run
        # must not silently retrain from the full-precision baseline —
        # run_train_loop resumes from state.step, this loop mirrors that)
        resumed = self.restore_model(state, FLAGS.uqtf_save_path)
        if resumed is not None:
            state = resumed
        else:
            state, _ = self.restore_baseline(state)
        start_iter = int(jax.device_get(state.step))

        step_bn = self.build_qat_train_step(tx, freeze_bn=False)
        step_frozen = self.build_qat_train_step(tx, freeze_bn=True)
        freeze_at = FLAGS.uqtf_freeze_bn_delay
        eval_step = self.build_qat_eval_step()

        # device_prefetch runs put_batch internally: global sharded batches
        # (multi-host correct) with 2 copies in flight, like run_train_loop
        iterator = self.device_prefetch(self.dataset_train.build())
        base_rng = self.next_rng()
        for idx_iter in range(start_iter, self.finetune_steps):
            use_frozen = freeze_at is not None and idx_iter >= freeze_at
            step = step_frozen if use_frozen else step_bn
            state, metrics = step(state, next(iterator),
                                  jax.random.fold_in(base_rng, idx_iter))
            if (idx_iter + 1) % FLAGS.summ_step == 0:
                host = {k: float(v) for k, v in jax.device_get(metrics).items()
                        if np.ndim(v) == 0}
                self.log.info('iter %d: %s', idx_iter + 1,
                              ' | '.join('%s = %.4f' % kv for kv in host.items()))
            if (idx_iter + 1) % FLAGS.save_step == 0:
                # all processes: multi-process saves route through orbax,
                # whose finalize is a cross-process collective
                self.save_model(state, FLAGS.uqtf_save_path)
        self.save_model(state, FLAGS.uqtf_save_path)
        self.auto_barrier()
        self.run_eval_loop(state, eval_step)
        return state

    def evaluate(self) -> Dict[str, float]:
        state, _, _ = self.init_state_quant()
        restored = self.restore_model(state, FLAGS.uqtf_save_path)
        if restored is None:
            raise FileNotFoundError('no checkpoint found under ' + FLAGS.uqtf_save_path)
        return self.run_eval_loop(restored, self.build_qat_eval_step())

    def export_quant_spec(self, state: TrainState) -> Dict:
        """Trained quantization spec for deployment export: the EMA
        activation ranges + weight sites/bits the int8 TFLite artifact must
        embed (tools/export_tflite.build_qat_deploy_forward; reference
        export_quant_tflite_model.py carries the graph's FakeQuant ranges
        into the flatbuffer)."""
        extra = jax.device_get(state.extra)
        return {'weight_paths': list(self.statistics['weight_paths']),
                'act_min': np.asarray(extra['act_min'], np.float32),
                'act_max': np.asarray(extra['act_max'], np.float32),
                'weight_bits': int(FLAGS.uqtf_weight_bits),
                'act_bits': int(FLAGS.uqtf_activation_bits)}
