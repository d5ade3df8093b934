"""Knowledge-distillation helper.

Rebuild of /root/reference/learners/distillation_helper.py:33-158.  The
reference builds a second "distilled_model" variable scope, restores the
pretrained teacher with scope renaming, and serves stop_gradient'ed logits.
In JAX the teacher is simply a frozen params pytree closed over by the loss:

    kd_loss = loss_w_dst * CE(softmax(z_t / T), softmax(z_s / T))

with flags loss_w_dst=4.0 and tempr_dst=4.0 (reference :28-31).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.core import checkpoint as ckpt_lib
from pocketflow_tpu.core.metrics import get_logger


class DistillationHelper:
    """Holds the frozen teacher and computes the KD loss term."""

    def __init__(self, model_helper, teacher_variables: Optional[Dict[str, Any]] = None):
        self.model_helper = model_helper
        self.model = model_helper.create_model()
        self.log = get_logger()
        if teacher_variables is None:
            teacher_variables = self._restore_teacher()
        # one committed transfer (NOT per-leaf eager stop_gradient, which
        # dispatches one remote op per leaf on a tunneled backend); the
        # gradient is stopped at the teacher LOGITS in calc_logits
        from pocketflow_tpu.core import mesh as mesh_lib
        self.teacher_variables = jax.device_put(
            teacher_variables, mesh_lib.replicated_sharding())

    def _restore_teacher(self) -> Dict[str, Any]:
        """Restore teacher params from the full-precision checkpoint dir.

        Reference restores from FLAGS.save_path with variable-scope renaming
        (distillation_helper.py:122-145); here the checkpoint is already a
        plain pytree so no renaming is needed.
        """
        import os
        path = ckpt_lib.latest_checkpoint(os.path.dirname(FLAGS.save_path) or '.')
        if path is None:
            # the baseline may have been saved by the orbax backend
            # orbax is also the silent multi-process-TP fallback in save()
            raw = None
            if (FLAGS.get('ckpt_backend', 'msgpack') == 'orbax'
                    or jax.process_count() > 1):
                raw = ckpt_lib._orbax_restore_raw(FLAGS.save_path)
            if raw is None:
                raise FileNotFoundError(
                    'distillation requires a pretrained full-prec checkpoint '
                    'under ' + os.path.dirname(FLAGS.save_path))
        elif os.path.isdir(path):
            # latest_checkpoint found an orbax step dir (orbax backend, or
            # the multi-process fallback in save())
            raw = ckpt_lib._orbax_restore_raw(FLAGS.save_path)
            if raw is None:
                raise FileNotFoundError(
                    'distillation requires a pretrained full-prec checkpoint '
                    'under ' + os.path.dirname(FLAGS.save_path))
        else:
            # The checkpoint holds a full TrainState; deserialize generically.
            from flax import serialization
            with open(path, 'rb') as fin:
                raw = serialization.msgpack_restore(fin.read())
        return {'params': raw['params'], 'batch_stats': raw.get('batch_stats', {})}

    def calc_logits(self, images: jax.Array) -> jax.Array:
        """Teacher forward pass (eval mode, stop-gradient)."""
        outputs = self.model_helper.forward_eval(self.model, self.teacher_variables, images)
        return jax.lax.stop_gradient(outputs)

    def calc_loss(self, student_logits: jax.Array, teacher_logits: jax.Array) -> jax.Array:
        """Soft-label cross-entropy at temperature T, scaled by loss_w_dst."""
        tempr = FLAGS.tempr_dst
        teacher_probs = jax.nn.softmax(teacher_logits.astype(jnp.float32) / tempr)
        student_logp = jax.nn.log_softmax(student_logits.astype(jnp.float32) / tempr)
        ce = -jnp.mean(jnp.sum(teacher_probs * student_logp, axis=-1))
        return FLAGS.loss_w_dst * ce

    def loss_extra_fn(self):
        """Adapter for AbstractLearner.build_train_step(loss_extra_fn=...)."""
        def fn(state, outputs, images, labels) -> Tuple[jax.Array, Dict[str, jax.Array]]:
            del state, labels
            teacher_logits = self.calc_logits(images)
            dst_loss = self.calc_loss(outputs, teacher_logits)
            return dst_loss, {'dst_loss': dst_loss}
        return fn
