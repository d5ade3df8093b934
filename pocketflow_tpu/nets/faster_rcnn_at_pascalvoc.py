"""Faster-RCNN (ResNet backbone) @ PascalVOC.

Rebuild of /root/reference/nets/faster_rcnn_at_pascalvoc.py (745 LoC wrapper
over ~1.4k LoC of vendored TF code).  ``forward_w_labels=True`` as in the
reference (:471-513): target assignment happens inside the forward pass, so
the train forward needs ground truth.  All stages — RPN, proposal NMS,
ROI-align, heads, target layers — are fixed-shape jittable functions
(nets/detection/faster_rcnn.py); nothing leaves the device during training.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.core import schedules
from pocketflow_tpu.datasets.pascalvoc import PascalVocDataset
from pocketflow_tpu.nets.abstract_model_helper import AbstractModelHelper
from pocketflow_tpu.nets.detection import anchors as anchor_lib
from pocketflow_tpu.nets.detection import faster_rcnn as frcnn
from pocketflow_tpu.nets.detection import nms as nms_lib
from pocketflow_tpu.nets.detection import voc_eval
from pocketflow_tpu.nn import BatchNorm, PFConv, max_pool, relu
from pocketflow_tpu.nn.layers import PFDense

FLAGS.DEFINE_integer('frcnn_nb_proposals', 64, 'Faster-RCNN: # of proposals kept')
FLAGS.DEFINE_integer('frcnn_nb_pre_nms', 512, 'Faster-RCNN: top-k before NMS')
FLAGS.DEFINE_float('frcnn_rpn_nms_threshold', 0.7, 'Faster-RCNN: RPN NMS IoU')
FLAGS.DEFINE_integer('frcnn_roi_size', 7, 'Faster-RCNN: ROI-align output size')

RPN_SCALES = (0.15, 0.3, 0.5, 0.75)
RPN_RATIOS = (0.5, 1.0, 2.0)


class SmallResNetBackbone(nn.Module):
    """Compact ResNet-style backbone -> stride-8 feature map."""
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        x = PFConv(64, (7, 7), (2, 2), use_bias=False, dtype=self.dtype,
                   name='conv_init')(x)
        x = BatchNorm(dtype=self.dtype, name='bn_init')(x, use_running_average=not train)
        x = relu(x)
        x = max_pool(x, (3, 3), (2, 2), padding='SAME')
        from pocketflow_tpu.nets.resnet import BasicBlock
        for idx, width in enumerate((64, 128, 128)):
            strides = (2, 2) if idx == 2 else (1, 1)
            x = BasicBlock(width, strides, self.dtype,
                           name='block%d' % idx)(x, train)
        return x  # stride 8 after init(4) * block2(2)... stride 8


class FasterRCNN(nn.Module):
    """RPN + ROI heads; __call__(images, labels, train) -> outputs dict."""
    nb_classes: int = 21
    dtype: object = jnp.bfloat16

    def setup(self):
        self.backbone = SmallResNetBackbone(dtype=self.dtype, name='backbone')
        self.rpn_conv = PFConv(256, (3, 3), dtype=self.dtype, name='rpn_conv')
        nb_anchors = len(RPN_SCALES) * len(RPN_RATIOS)
        self.rpn_obj = PFConv(nb_anchors, (1, 1), dtype=self.dtype, name='rpn_obj')
        self.rpn_box = PFConv(nb_anchors * 4, (1, 1), dtype=self.dtype, name='rpn_box')
        self.fc1 = PFDense(512, dtype=self.dtype, name='fc1')
        self.fc2 = PFDense(512, dtype=self.dtype, name='fc2')
        self.cls_head = PFDense(self.nb_classes, dtype=self.dtype, name='cls_head')
        self.box_head = PFDense(self.nb_classes * 4, dtype=self.dtype, name='box_head')

    def _anchors_for(self, fsize: int) -> jnp.ndarray:
        anchors = []
        for y in range(fsize):
            for x in range(fsize):
                cy, cx = (y + 0.5) / fsize, (x + 0.5) / fsize
                for s in RPN_SCALES:
                    for r in RPN_RATIOS:
                        h, w = s * (r ** 0.5), s / (r ** 0.5)
                        anchors.append([cy - h / 2, cx - w / 2,
                                        cy + h / 2, cx + w / 2])
        return jnp.clip(jnp.asarray(anchors, jnp.float32), 0.0, 1.0)

    def __call__(self, images, labels=None, train: bool = True):
        feats = self.backbone(images, train)
        rpn = relu(self.rpn_conv(feats))
        fsize = feats.shape[1]
        anchors = self._anchors_for(fsize)
        b = images.shape[0]
        obj_logits = self.rpn_obj(rpn).reshape(b, -1).astype(jnp.float32)
        rpn_deltas = self.rpn_box(rpn).reshape(b, -1, 4).astype(jnp.float32)

        nb_props = FLAGS.frcnn_nb_proposals

        def per_image(obj, deltas, feat):
            props, valid = frcnn.propose(
                jax.nn.sigmoid(obj), deltas, anchors,
                FLAGS.frcnn_nb_pre_nms, nb_props,
                FLAGS.frcnn_rpn_nms_threshold)
            rois = frcnn.roi_align(feat.astype(jnp.float32), props,
                                   FLAGS.frcnn_roi_size)
            return props, valid, rois

        props, valid, rois = jax.vmap(per_image)(obj_logits, rpn_deltas, feats)
        x = rois.reshape(b * nb_props, -1).astype(self.dtype)
        x = relu(self.fc1(x))
        x = relu(self.fc2(x))
        cls_logits = self.cls_head(x).astype(jnp.float32)
        box_deltas = self.box_head(x).astype(jnp.float32)
        outputs = {
            'anchors': anchors,
            'obj_logits': obj_logits,
            'rpn_deltas': rpn_deltas,
            'proposals': props,
            'proposal_valid': valid,
            'cls_logits': cls_logits.reshape(b, nb_props, self.nb_classes),
            'box_deltas': box_deltas.reshape(b, nb_props, self.nb_classes * 4),
        }
        return outputs


class ModelHelper(AbstractModelHelper):
    """Model helper for Faster-RCNN @ PascalVOC (forward_w_labels=True)."""

    model_name = 'faster_rcnn'
    dataset_name = 'pascalvoc'

    def __init__(self, data_format='channels_last'):
        super().__init__(data_format, forward_w_labels=True)
        self.dataset_train = PascalVocDataset(is_train=True)
        self.dataset_eval = PascalVocDataset(is_train=False)
        self.nb_classes = self.dataset_train.spec.nb_classes
        self._detections: List[List[Dict]] = []
        self._groundtruth: List[np.ndarray] = []

    def build_dataset_train(self, enbl_trn_val_split=False):
        return self.dataset_train

    def build_dataset_eval(self):
        return self.dataset_eval

    def create_model(self):
        dtype = jnp.bfloat16 if FLAGS.compute_dtype == 'bfloat16' else jnp.float32
        return FasterRCNN(nb_classes=self.nb_classes, dtype=dtype)

    def calc_loss(self, labels, outputs, trainable_vars):
        labels = labels.astype(jnp.float32)
        anchors = outputs['anchors']

        def per_image(obj, rpn_d, props, valid, cls_l, box_d, lab):
            gt_boxes, gt_cls, gt_valid = lab[:, 1:5], lab[:, 0], lab[:, 5]
            rpn_lab, rpn_t = frcnn.rpn_targets(gt_boxes, gt_valid, anchors)
            l_rpn = frcnn.rpn_loss(obj, rpn_d, rpn_lab, rpn_t)
            cls_t, box_t, fg, vmask = frcnn.proposal_targets(
                props, valid, gt_boxes, gt_cls, gt_valid)
            l_rcnn = frcnn.rcnn_loss(cls_l, box_d, cls_t, box_t, fg, vmask)
            # proxy accuracy: fraction of fg ROIs classified correctly
            pred = jnp.argmax(cls_l, axis=-1)
            acc = jnp.sum((pred == cls_t) * fg) / jnp.maximum(jnp.sum(fg), 1.0)
            return l_rpn, l_rcnn, acc

        l_rpn, l_rcnn, acc = jax.vmap(per_image)(
            outputs['obj_logits'], outputs['rpn_deltas'], outputs['proposals'],
            outputs['proposal_valid'], outputs['cls_logits'],
            outputs['box_deltas'], labels)
        loss = jnp.mean(l_rpn) + jnp.mean(l_rcnn)
        loss = loss + self.weight_decay_loss(trainable_vars, exclude_bn=True)
        return loss, {'rpn_loss': jnp.mean(l_rpn), 'rcnn_loss': jnp.mean(l_rcnn),
                      'accuracy': jnp.mean(acc)}

    def forward_eval(self, model, variables, inputs, policy=None):
        from pocketflow_tpu.nn.layers import compression
        with compression(policy):
            return model.apply(variables, inputs, labels=None, train=False)

    def warm_start(self, state):
        """Graft backbone weights from a classification checkpoint
        (reference faster_rcnn helper warm-starts its ResNet backbone)."""
        from pocketflow_tpu.core import checkpoint as ckpt_lib
        params, nb = ckpt_lib.restore_intersecting(
            FLAGS.save_path, state.params, prefix_map={'': 'backbone/'})
        return state.replace(params=params)

    def setup_lrn_rate(self, global_batch_size: int):
        nb_epochs = 25
        nb_smpls = self.dataset_train.spec.nb_smpls_train
        schedule = schedules.piecewise_constant(
            global_batch_size, [15, 20], [1.0, 0.1, 0.01], nb_smpls)
        nb_iters = int(nb_smpls * nb_epochs * FLAGS.nb_epochs_rat / global_batch_size)
        return schedule, nb_iters

    # ------------------------------------------------------------------
    # dump_n_eval protocol (reference dump_n_eval -> VOC mAP)
    # ------------------------------------------------------------------

    def dump_n_eval(self, outputs=None, action: str = 'init'):
        if action == 'init':
            self._detections, self._groundtruth = [], []
            return None
        if action == 'dump':
            out, labels = outputs
            probs = np.asarray(jax.device_get(
                jax.nn.softmax(out['cls_logits'], axis=-1)))
            props = np.asarray(jax.device_get(out['proposals']))
            deltas = np.asarray(jax.device_get(out['box_deltas']))
            valid = np.asarray(jax.device_get(out['proposal_valid']))
            labels = np.asarray(jax.device_get(labels))
            nb_classes = probs.shape[-1]
            for i in range(probs.shape[0]):
                d = deltas[i].reshape(-1, nb_classes, 4)
                best_cls = probs[i, :, 1:].argmax(-1) + 1
                own = d[np.arange(d.shape[0]), best_cls]
                boxes = np.asarray(jax.device_get(anchor_lib.decode_boxes(
                    jnp.asarray(own), jnp.asarray(props[i]))))
                dets = []
                probs_i = probs[i].copy()
                probs_i[valid[i] < 0.5] = 0.0
                dets = nms_lib.parse_detections(probs_i, boxes,
                                                score_threshold=0.05)
                self._detections.append(dets)
                self._groundtruth.append(labels[i])
            return None
        if action == 'eval':
            return voc_eval.evaluate_detections(
                self._detections, self._groundtruth, self.nb_classes)
        raise ValueError('unrecognized dump_n_eval action: ' + action)

    def evaluate_map(self, model, state, dataset, nb_batches: int = 8):
        self.dump_n_eval(action='init')
        iterator = dataset.build()
        fwd = jax.jit(lambda v, x: model.apply(v, x, labels=None, train=False))
        for _ in range(nb_batches):
            batch = next(iterator)
            images = dataset.augment(jnp.asarray(batch['image']),
                                     jax.random.PRNGKey(0), False)
            variables = {'params': state.params, 'batch_stats': state.batch_stats}
            out = fwd(variables, images)
            self.dump_n_eval((out, batch['label']), 'dump')
        return self.dump_n_eval(action='eval')
