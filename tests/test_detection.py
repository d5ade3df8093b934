"""Detection stack tests: anchors, matching, SSD loss, NMS, VOC mAP, e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def test_anchor_generation_counts():
    from pocketflow_tpu.nets.detection.anchors import generate_anchors
    anchors = generate_anchors([8, 4], [0.2, 0.4, 0.6], [[2.0, 0.5]] * 2)
    assert anchors.shape == ((64 + 16) * 4, 4)
    assert np.all(anchors >= 0.0) and np.all(anchors <= 1.0)


def test_iou_and_encode_decode_roundtrip():
    from pocketflow_tpu.nets.detection.anchors import (decode_boxes,
                                                       encode_boxes, iou_matrix)
    a = jnp.asarray([[0.0, 0.0, 0.5, 0.5], [0.25, 0.25, 0.75, 0.75]])
    iou = np.asarray(iou_matrix(a, a))
    np.testing.assert_allclose(np.diag(iou), 1.0, rtol=1e-5)
    assert 0.1 < iou[0, 1] < 0.2  # 1/16 overlap over union 7/16
    gt = jnp.asarray([[0.1, 0.2, 0.4, 0.6], [0.3, 0.3, 0.7, 0.8]])
    deltas = encode_boxes(gt, a)
    rec = np.asarray(decode_boxes(deltas, a))
    np.testing.assert_allclose(rec, np.asarray(gt), atol=1e-5)


def test_match_anchors_assigns_best():
    from pocketflow_tpu.nets.detection.anchors import generate_anchors, match_anchors
    anchors = jnp.asarray(generate_anchors([8], [0.3, 0.6], [[2.0, 0.5]]))
    gt_boxes = jnp.asarray([[0.2, 0.2, 0.5, 0.5], [0.0, 0.0, 0.0, 0.0]])
    gt_cls = jnp.asarray([3.0, 0.0])
    gt_valid = jnp.asarray([1.0, 0.0])
    cls_t, box_t, pos = match_anchors(gt_boxes, gt_cls, gt_valid, anchors)
    assert float(jnp.sum(pos)) >= 1.0  # bipartite step guarantees a match
    assert np.all(np.asarray(cls_t)[np.asarray(pos) > 0.5] == 3)


def test_nms_suppresses_overlaps():
    from pocketflow_tpu.nets.detection.nms import nms
    boxes = np.asarray([[0.0, 0.0, 0.5, 0.5], [0.01, 0.01, 0.51, 0.51],
                        [0.6, 0.6, 0.9, 0.9]])
    keep = nms(boxes, np.asarray([0.9, 0.8, 0.7]), iou_threshold=0.5)
    assert list(keep) == [0, 2]


def test_voc_eval_perfect_detections():
    from pocketflow_tpu.nets.detection.voc_eval import evaluate_detections
    gt = np.zeros((2, 4, 6), np.float32)
    gt[0, 0] = [1, 0.1, 0.1, 0.4, 0.4, 1.0]
    gt[1, 0] = [2, 0.5, 0.5, 0.9, 0.9, 1.0]
    dets = [
        [{'class': 1, 'score': 0.9, 'box': [0.1, 0.1, 0.4, 0.4]}],
        [{'class': 2, 'score': 0.8, 'box': [0.5, 0.5, 0.9, 0.9]}],
    ]
    result = evaluate_detections(dets, list(gt), nb_classes=3)
    assert result['mAP'] == pytest.approx(1.0)
    # a spurious detection lowers precision but not below 0
    dets[0].append({'class': 2, 'score': 0.95, 'box': [0.0, 0.0, 0.2, 0.2]})
    result = evaluate_detections(dets, list(gt), nb_classes=3)
    assert 0.0 < result['mAP'] < 1.0


def test_ssd_loss_decreases_with_matching_logits():
    from pocketflow_tpu.nets.detection.anchors import (encode_boxes,
                                                       generate_anchors,
                                                       match_anchors)
    from pocketflow_tpu.nets.detection.ssd_loss import ssd_loss
    anchors = jnp.asarray(generate_anchors([4], [0.4, 0.8], [[2.0, 0.5]]))
    A = anchors.shape[0]
    labels = np.zeros((1, 4, 6), np.float32)
    labels[0, 0] = [1, 0.2, 0.2, 0.6, 0.6, 1.0]
    labels = jnp.asarray(labels)
    # random logits vs oracle logits: the oracle must have smaller loss
    rng = jax.random.PRNGKey(0)
    bad_logits = jax.random.normal(rng, (1, A, 3))
    cls_t, box_t, pos = match_anchors(
        labels[0, :, 1:5], labels[0, :, 0], labels[0, :, 5], anchors)
    good_logits = 10.0 * jax.nn.one_hot(cls_t, 3)[None]
    good_boxes = box_t[None]
    loss_bad, _ = ssd_loss(bad_logits, jnp.zeros((1, A, 4)), labels, anchors)
    loss_good, m = ssd_loss(good_logits, good_boxes, labels, anchors)
    assert float(loss_good) < float(loss_bad)
    assert float(m['loc_loss']) == pytest.approx(0.0, abs=1e-5)


def test_ssd_vgg_forward_shapes():
    from pocketflow_tpu.nets.vgg import SSDVGG
    model = SSDVGG(nb_classes=21, nb_anchors_per_cell=4, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    cls_logits, box_deltas = model.apply(variables, x, train=False)
    sizes = SSDVGG.feature_sizes(64)
    nb_anchors = sum(s * s * 4 for s in sizes)
    assert cls_logits.shape == (2, nb_anchors, 21)
    assert box_deltas.shape == (2, nb_anchors, 4)


@pytest.mark.slow
def test_ssd_end_to_end_smoke(tmp_path):
    """Tiny SSD on synthetic VOC: loss must decrease, mAP computable."""
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.nets.vgg_at_pascalvoc import ModelHelper
    # nb_iters_cls_wmup=1: the production cls-loss warm-up (10k iters) would
    # zero out the cls gradient for this 12-step smoke window entirely
    with FLAGS.scope(batch_size=4, batch_size_eval=4, nb_smpls_train=128,
                     nb_smpls_eval=32, nb_epochs_rat=0.002, lrn_rate_init=0.01,
                     voc_image_size=64, nb_bboxs_max=8, loss_w_dcy=0.0,
                     nb_iters_cls_wmup=1):
        helper = ModelHelper()
        learner = FullPrecLearner(None, helper)
        state, tx, _ = learner.init_state()
        train_step = learner.build_train_step(tx)
        iterator = learner.dataset_train.build()
        losses = []
        for idx in range(12):
            state, metrics = train_step(state, next(iterator),
                                        jax.random.fold_in(jax.random.PRNGKey(0), idx))
            losses.append(float(jax.device_get(metrics['cls_loss'])))
        assert np.mean(losses[-3:]) < np.mean(losses[:3])
        result = helper.evaluate_map(learner.model, state, learner.dataset_eval,
                                     nb_batches=2)
        assert 'mAP' in result and 0.0 <= result['mAP'] <= 1.0
