"""Uniform-quantization (QAT) learner.

Rebuild of /root/reference/learners/uniform_quantization/learner.py:73-446.
The reference rewires the frozen TF graph with fake-quant subgraphs fed by
bit-list placeholders; here the quantization is a `QuantPolicy` applied inside
the fused jitted train step, with per-layer bits as traced arrays in
``TrainState.extra`` (so the RL bit search never recompiles).  The fake-quant
math itself is the fused Pallas/XLA STE kernel in ops/fake_quant.py.

Flow mirrors the reference: restore the pretrained full-precision baseline ->
BitOptimizer picks per-layer weight bits (uniform or DDPG under a bit budget)
-> finetune ``uql_quant_epochs`` with quantized forward -> evaluate.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.core import schedules
from pocketflow_tpu.learners.abstract_learner import AbstractLearner, TrainState
from pocketflow_tpu.learners.uniform_quantization import utils as uq_utils


def setup_bnds_decay_rates(model_name: str, dataset_name: str):
    """LR bounds/decays for the quant finetune (reference learner.py:51-71)."""
    if dataset_name in ('cifar_10', 'cifar10'):
        bnd_epochs, decay_rates = [15, 40], [1e-3, 1e-4, 1e-5]
    elif dataset_name in ('ilsvrc_12', 'ilsvrc12'):
        if model_name.startswith('mobilenet'):
            bnd_epochs, decay_rates = [5, 30], [1e-4, 1e-5, 1e-6]
        else:
            bnd_epochs, decay_rates = [5, 20], [1e-4, 1e-5, 1e-6]
    else:  # e.g. fmnist tutorial config — mirror the cifar recipe
        bnd_epochs, decay_rates = [15, 40], [1e-3, 1e-4, 1e-5]
    return bnd_epochs, decay_rates


def quant_finetune_schedule(model_name: str, dataset_name: str,
                            nb_smpls: int, global_batch_size: int,
                            quant_epochs: float = None):
    """Shared quant-finetune LR schedule + step count — one copy for the
    uql/nuql/uqtf learners (they follow the same finetune convention;
    nuql passes its own epoch flag)."""
    bnd_epochs, decay_rates = setup_bnds_decay_rates(model_name, dataset_name)
    schedule = schedules.piecewise_constant(
        global_batch_size, bnd_epochs, decay_rates, nb_smpls)
    epochs = quant_epochs if quant_epochs is not None else FLAGS.uql_quant_epochs
    finetune_steps = max(1, int(
        nb_smpls * epochs * FLAGS.nb_epochs_rat / global_batch_size))
    return schedule, finetune_steps


class UniformQuantLearner(AbstractLearner):
    """Uniform quantization of weights (and optionally activations)."""

    def __init__(self, sm_writer, model_helper):
        super().__init__(sm_writer, model_helper)
        self.enbl_dst = FLAGS.enbl_dst
        self.helper_dst = None
        if self.enbl_dst:
            from pocketflow_tpu.learners.distillation_helper import DistillationHelper
            self.helper_dst = DistillationHelper(model_helper)

        # discover quant sites with one abstract trace (utils.py:115-137);
        # only the SHAPE matters, so synthesize instead of spinning up (and
        # leaking) a real data iterator just for one sample
        sample = self.dataset_train.synthesize_arrays(2)[0]
        sample = self.dataset_train.augment(
            jnp.asarray(sample[:2]), jax.random.PRNGKey(0), False)
        variables = model_helper.init_model(jax.random.PRNGKey(0), sample)
        self.statistics = uq_utils.discover_quant_sites(self.model, variables, sample)

        self.optimal_w_bit_list: Optional[List[int]] = None
        self.optimal_a_bit_list: Optional[List[int]] = None

    # ------------------------------------------------------------------
    # state & step builders (bench.py entry points)
    # ------------------------------------------------------------------

    def _policy_fn(self):
        weight_paths = self.statistics['weight_paths']

        def policy_fn(state: TrainState):
            return uq_utils.QuantPolicy(
                weight_paths, state.extra['w_bits'], state.extra['a_bits'])

        return policy_fn

    def quant_schedule(self) -> Tuple[schedules.Schedule, int]:
        """Piecewise finetune schedule + step count (learner.py:51-71)."""
        return quant_finetune_schedule(
            self.model_name, self.dataset_name,
            self.dataset_train.spec.nb_smpls_train, self.global_batch_size)

    def init_state_quant(self, w_bit_list=None, a_bit_list=None):
        """Init state whose extra carries the per-layer bit arrays."""
        extra = uq_utils.bits_state(self.statistics, w_bit_list, a_bit_list)
        state, _, _ = self.init_state(extra=extra)
        schedule, self.finetune_steps = self.quant_schedule()
        tx = optax.sgd(learning_rate=schedule, momentum=FLAGS.momentum)
        state = state.replace(opt_state=self.init_opt_state(tx, state.params))
        return state, tx, schedule

    def build_quant_train_step(self, tx):
        loss_extra = self.helper_dst.loss_extra_fn() if self.helper_dst else None
        return self.build_train_step(tx, policy_fn=self._policy_fn(),
                                     loss_extra_fn=loss_extra)

    def build_quant_eval_step(self):
        return self.build_eval_step(policy_fn=self._policy_fn())

    def set_bits(self, state: TrainState, w_bit_list, a_bit_list) -> TrainState:
        extra = uq_utils.bits_state(self.statistics, w_bit_list, a_bit_list)
        return self.set_extra(state, extra)

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    def train(self) -> TrainState:
        state, tx, _ = self.init_state_quant()
        state, _ = self.restore_baseline(state)  # pretrained baseline

        # pick per-layer bits (BitOptimizer; uniform unless uql_enbl_rl_agent)
        from pocketflow_tpu.learners.uniform_quantization.bit_optimizer import BitOptimizer
        bit_optimizer = BitOptimizer(self, state)
        self.optimal_w_bit_list, self.optimal_a_bit_list = bit_optimizer.run()
        state = self.set_bits(state, self.optimal_w_bit_list, self.optimal_a_bit_list)
        self.log.info('optimal weight bits: %s', self.optimal_w_bit_list)

        train_step = self.build_quant_train_step(tx)
        eval_step = self.build_quant_eval_step()
        state = self.run_train_loop(
            state, train_step, nb_iters=self.finetune_steps,
            save_path=FLAGS.uql_save_quant_model_path,
            eval_fn=lambda s: self.run_eval_loop(s, eval_step))
        metrics = self.run_eval_loop(state, eval_step)
        if FLAGS.uql_use_buckets:
            self.log.info('bucket storage overhead: %d bits',
                          uq_utils.bucket_storage_bits(self.statistics))
        return state

    def evaluate(self) -> Dict[str, float]:
        state, _, _ = self.init_state_quant(
            self.optimal_w_bit_list, self.optimal_a_bit_list)
        restored = self.restore_model(state, FLAGS.uql_save_quant_model_path)
        if restored is None:
            raise FileNotFoundError(
                'no checkpoint found under ' + FLAGS.uql_save_quant_model_path)
        return self.run_eval_loop(restored, self.build_quant_eval_step())
