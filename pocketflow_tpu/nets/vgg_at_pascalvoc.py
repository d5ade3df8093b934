"""SSD-VGG @ PascalVOC (rebuild of /root/reference/nets/vgg_at_pascalvoc.py).

The reference wraps the vendored ssd_tensorflow implementation: anchors setup
and per-class NMS prediction parse (:84-217), SSD loss with hard negative
mining (:286-411), backbone warm-start with variable renaming (:479-552), and
VOC mAP via dump_n_eval -> voc_eval.do_python_eval (:554-583).  Every piece
has a TPU-native module here:

* anchors + matching + encode/decode: nets/detection/anchors.py (on device,
  inside the jitted train step — the reference matches in tf.data on CPU);
* loss: nets/detection/ssd_loss.py;
* prediction parse: nets/detection/nms.py (host, eval-only);
* mAP: nets/detection/voc_eval.py via the same dump_n_eval hook protocol
  ('init' / 'dump' / 'eval').
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.core import schedules
from pocketflow_tpu.datasets.pascalvoc import PascalVocDataset
from pocketflow_tpu.nets.abstract_model_helper import AbstractModelHelper
from pocketflow_tpu.nets.detection import anchors as anchor_lib
from pocketflow_tpu.nets.detection import nms as nms_lib
from pocketflow_tpu.nets.detection import ssd_loss as loss_lib
from pocketflow_tpu.nets.detection import voc_eval
from pocketflow_tpu.nets.vgg import SSDVGG

FLAGS.DEFINE_float('ssd_negative_ratio', 3.0, 'SSD: hard-negative ratio')
FLAGS.DEFINE_float('ssd_match_threshold', 0.5, 'SSD: anchor-match IoU threshold')
FLAGS.DEFINE_float('ssd_nms_threshold', 0.45, 'SSD: NMS IoU threshold')
FLAGS.DEFINE_float('ssd_score_threshold', 0.05, 'SSD: detection score threshold')
# reference vgg_at_pascalvoc.py:53,59-60,406-410: the classification loss is
# ramped 0->1 over the first nb_iters_cls_wmup steps (localization trains
# first) — without it a from-scratch VGG-SSD (no BN anywhere) collapses to
# predicting background at every anchor and never recovers
FLAGS.DEFINE_integer('nb_iters_cls_wmup', 10000,
                     'SSD: iterations to warm up the classification loss')
FLAGS.DEFINE_float('lrn_rate_min', 1e-6, 'SSD: minimal learning rate floor')

# anchor scales/aspect-ratios per feature map (SSD-300 defaults)
SSD_SCALES = [0.1, 0.2, 0.375, 0.55, 0.725, 0.9, 1.0]
SSD_ASPECTS = [[2.0, 0.5]] * 6


class ModelHelper(AbstractModelHelper):
    """Model helper for SSD-VGG @ PascalVOC (detection)."""

    model_name = 'vgg_ssd'
    dataset_name = 'pascalvoc'

    def __init__(self, data_format='channels_last'):
        super().__init__(data_format, forward_w_labels=False)
        self.dataset_train = PascalVocDataset(is_train=True)
        self.dataset_eval = PascalVocDataset(is_train=False)
        self.nb_classes = self.dataset_train.spec.nb_classes
        image_size = self.dataset_train.spec.image_shape[0]
        feature_sizes = SSDVGG.feature_sizes(image_size)
        nb_scales = len(feature_sizes)
        self.anchors_np = anchor_lib.generate_anchors(
            feature_sizes, SSD_SCALES[:nb_scales + 1],
            SSD_ASPECTS[:nb_scales])
        self._detections: List[List[Dict]] = []
        self._groundtruth: List[np.ndarray] = []

    def build_dataset_train(self, enbl_trn_val_split=False):
        return self.dataset_train

    def build_dataset_eval(self):
        return self.dataset_eval

    def create_model(self):
        dtype = jnp.bfloat16 if FLAGS.compute_dtype == 'bfloat16' else jnp.float32
        # derived, not hardcoded: generate_anchors emits 2 + len(aspects)
        # anchors per cell, and the heads must agree
        return SSDVGG(nb_classes=self.nb_classes,
                      nb_anchors_per_cell=2 + len(SSD_ASPECTS[0]),
                      dtype=dtype)

    def calc_loss(self, labels, outputs, trainable_vars, step=None):
        cls_logits, box_deltas = outputs
        anchors = jnp.asarray(self.anchors_np)
        loss, metrics = loss_lib.ssd_loss(
            cls_logits, box_deltas, labels.astype(jnp.float32), anchors,
            negative_ratio=FLAGS.ssd_negative_ratio,
            pos_threshold=FLAGS.ssd_match_threshold)
        if step is not None:
            # cls-loss warm-up (reference :406-410): loss = w*cls + loc with
            # w = min(step / nb_iters_cls_wmup, 1).  Only the fused TRAIN
            # step passes `step`; eval and compression finetunes (which start
            # from a trained baseline) use the full loss.
            w_cls = jnp.minimum(
                step.astype(jnp.float32) / float(FLAGS.nb_iters_cls_wmup), 1.0)
            loss = w_cls * metrics['cls_loss'] + metrics['loc_loss']
        loss = loss + self.weight_decay_loss(trainable_vars, exclude_bn=True)
        # proxy accuracy: fraction of images whose best-scoring anchor class
        # appears in the ground truth (cheap, jittable)
        probs = jax.nn.softmax(cls_logits, axis=-1)
        fg = probs[..., 1:]
        best_flat = jnp.argmax(fg.reshape(fg.shape[0], -1), axis=1)
        best_cls = best_flat % (self.nb_classes - 1) + 1
        gt_cls = labels[..., 0].astype(jnp.int32)
        gt_valid = labels[..., 5] > 0.5
        hit = jnp.any((gt_cls == best_cls[:, None]) & gt_valid, axis=1)
        metrics = {**metrics, 'accuracy': jnp.mean(hit.astype(jnp.float32))}
        return loss, metrics

    def setup_lrn_rate(self, global_batch_size: int):
        nb_epochs = 120  # SSD-VOC recipe
        nb_smpls = self.dataset_train.spec.nb_smpls_train
        base = schedules.piecewise_constant(
            global_batch_size, [80, 100], [1.0, 0.1, 0.01], nb_smpls)
        # reference :474: lrn_rate = max(lrn_rate, lrn_rate_min)
        floor = float(FLAGS.lrn_rate_min)
        schedule = lambda step: jnp.maximum(base(step), floor)
        nb_iters = int(nb_smpls * nb_epochs * FLAGS.nb_epochs_rat / global_batch_size)
        return schedule, nb_iters

    def warm_start(self, state):
        """Backbone warm-start: graft conv weights from a classification
        checkpoint (``--save_path``) into the `vgg/` backbone by name+shape
        intersection — the reference's renamed-variable restore (:479-552)."""
        from pocketflow_tpu.core import checkpoint as ckpt_lib
        from pocketflow_tpu.core.metrics import get_logger
        params, nb = ckpt_lib.restore_intersecting(
            FLAGS.save_path, state.params, prefix_map={'': 'vgg/'})
        log = get_logger()
        if nb:
            log.info('warm start: %d backbone tensors grafted', nb)
        else:
            # a silent no-op means the SSD trains from random init while the
            # user believes the VGG backbone was grafted
            log.warning('warm_start grafted NO tensors from %s — is the '
                        'checkpoint missing or from a different trunk?',
                        FLAGS.save_path)
        return state.replace(params=params)

    # ------------------------------------------------------------------
    # dump_n_eval protocol (reference :554-583)
    # ------------------------------------------------------------------

    def dump_n_eval(self, outputs=None, action: str = 'init'):
        if action == 'init':
            self._detections, self._groundtruth = [], []
            return None
        if action == 'dump':
            (cls_logits, box_deltas), labels = outputs
            # ONE jitted batched decode instead of a per-image eager call
            # (each eager dispatch is a device round-trip)
            if not hasattr(self, '_decode_batch'):
                anchors = jnp.asarray(self.anchors_np)
                self._decode_batch = jax.jit(lambda cl, bd: (
                    jax.nn.softmax(cl, axis=-1),
                    jax.vmap(lambda d: anchor_lib.decode_boxes(d, anchors))(bd)))
            probs, boxes_b = jax.device_get(
                self._decode_batch(cls_logits, box_deltas))
            probs = np.asarray(probs)
            boxes_b = np.asarray(boxes_b)
            labels = np.asarray(jax.device_get(labels))
            for i in range(probs.shape[0]):
                self._detections.append(nms_lib.parse_detections(
                    probs[i], boxes_b[i],
                    score_threshold=FLAGS.ssd_score_threshold,
                    iou_threshold=FLAGS.ssd_nms_threshold))
                self._groundtruth.append(labels[i])
            return None
        if action == 'eval':
            return voc_eval.evaluate_detections(
                self._detections, self._groundtruth, self.nb_classes)
        raise ValueError('unrecognized dump_n_eval action: ' + action)

    def evaluate_map(self, model, state, dataset, nb_batches=None):
        """Full detection eval loop -> VOC mAP (learner-callable).

        Defaults to the FULL loaded eval set (reference scores all 4,952 VOC
        test images, vgg_at_pascalvoc.py:554-583); pass nb_batches for smoke
        runs.  Shared driver: nets/detection/eval_loop.py.
        """
        from pocketflow_tpu.nets.detection.eval_loop import run_detection_eval
        return run_detection_eval(
            self, model, state, dataset,
            lambda v, x: model.apply(v, x, train=False), nb_batches)
