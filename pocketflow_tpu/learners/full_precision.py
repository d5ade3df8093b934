"""Full-precision learner: trains/evaluates the uncompressed baseline.

Rebuild of /root/reference/learners/full_precision/learner.py:33-228.  This is
the template learner: one fused jitted train step (forward + loss [+ KD] +
backward + cross-chip gradient mean + SGD update), a host loop that only feeds
batches and logs, and an eval loop over the evaluation subset.
"""

from __future__ import annotations

from typing import Optional

import jax

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.learners.abstract_learner import AbstractLearner, TrainState


class FullPrecLearner(AbstractLearner):
    """Full-precision baseline learner."""

    def __init__(self, sm_writer, model_helper, enbl_dst: Optional[bool] = None):
        super().__init__(sm_writer, model_helper)
        self.enbl_dst = FLAGS.enbl_dst if enbl_dst is None else enbl_dst
        self.helper_dst = None
        if self.enbl_dst:
            from pocketflow_tpu.learners.distillation_helper import DistillationHelper
            self.helper_dst = DistillationHelper(model_helper)

    def train(self) -> TrainState:
        state, tx, _ = self.init_state()
        if FLAGS.enbl_warm_start:
            state = self.warm_start(state)
        loss_extra = self.helper_dst.loss_extra_fn() if self.helper_dst else None
        train_step = self.build_train_step(tx, loss_extra_fn=loss_extra)
        eval_step = self.build_eval_step()
        state = self.run_train_loop(
            state, train_step,
            eval_fn=lambda s: self.run_eval_loop(s, eval_step))
        self.run_eval_loop(state, eval_step)
        return state

    def evaluate(self):
        state, _, _ = self.init_state()
        restored = self.restore_model(state)
        if restored is None:
            raise FileNotFoundError('no checkpoint found under ' + FLAGS.save_path)
        eval_step = self.build_eval_step()
        metrics = self.run_eval_loop(restored, eval_step)
        # detection helpers add VOC mAP through the dump_n_eval protocol
        # (reference: evaluate() -> dump_n_eval('init'/'dump'/'eval'))
        if hasattr(self.model_helper, 'evaluate_map'):
            # FULL eval set: the reference scores all 4,952 VOC test images
            # (vgg_at_pascalvoc.py:554-583); smoke tests shrink the set via
            # --nb_smpls_eval instead of capping batches here.  The batch
            # count comes from the samples ACTUALLY loaded on this process
            # (nets/detection/eval_loop.nb_eval_batches), so the synthetic
            # fallback / sharded runs never re-score wrapped-around images.
            map_metrics = self.model_helper.evaluate_map(
                self.model, restored, self.dataset_eval)
            self.log.info('detection eval: mAP = %.4f', map_metrics.get('mAP', 0.0))
            metrics = {**metrics, **map_metrics}
        return metrics
