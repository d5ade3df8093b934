"""Faster-RCNN component + smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def test_nms_fixed_matches_host_nms():
    from pocketflow_tpu.nets.detection.faster_rcnn import nms_fixed
    from pocketflow_tpu.nets.detection.nms import nms
    rng = np.random.default_rng(0)
    centers = rng.uniform(0.2, 0.8, size=(20, 2))
    sizes = rng.uniform(0.05, 0.2, size=(20, 2))
    boxes = np.concatenate([centers - sizes, centers + sizes], axis=1).astype(np.float32)
    scores = rng.uniform(size=20).astype(np.float32)
    idx, valid = jax.jit(lambda b, s: nms_fixed(b, s, 10, 0.5))(
        jnp.asarray(boxes), jnp.asarray(scores))
    picked = np.asarray(idx)[np.asarray(valid)]
    expected = nms(boxes, scores, 0.5, 10)
    np.testing.assert_array_equal(picked, expected[:len(picked)])


def test_roi_align_constant_feature():
    from pocketflow_tpu.nets.detection.faster_rcnn import roi_align
    feat = jnp.ones((16, 16, 8)) * 3.0
    rois = jnp.asarray([[0.1, 0.1, 0.6, 0.6], [0.0, 0.0, 1.0, 1.0]])
    out = roi_align(feat, rois, output_size=4)
    assert out.shape == (2, 4, 4, 8)
    np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-6)


def test_rpn_targets_and_loss():
    from pocketflow_tpu.nets.detection.faster_rcnn import rpn_loss, rpn_targets
    anchors = jnp.asarray([[0.1, 0.1, 0.4, 0.4], [0.5, 0.5, 0.9, 0.9],
                           [0.0, 0.0, 0.05, 0.05]])
    gt = jnp.asarray([[0.1, 0.1, 0.4, 0.4]])
    labels, box_t = rpn_targets(gt, jnp.asarray([1.0]), anchors)
    assert int(labels[0]) == 1  # exact match -> positive
    assert int(labels[1]) == 0  # no overlap -> negative
    # oracle logits/deltas → small loss
    good = rpn_loss(jnp.asarray([10.0, -10.0, -10.0]),
                    box_t, labels, box_t)
    bad = rpn_loss(jnp.asarray([-10.0, 10.0, 10.0]),
                   jnp.ones_like(box_t) * 3, labels, box_t)
    assert float(good) < float(bad)


def test_faster_rcnn_forward_and_train_smoke(tmp_path):
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.nets.faster_rcnn_at_pascalvoc import ModelHelper
    with FLAGS.scope(batch_size=2, batch_size_eval=2, nb_smpls_train=64,
                     nb_smpls_eval=16, nb_epochs_rat=0.01, lrn_rate_init=0.01,
                     voc_image_size=64, nb_bboxs_max=8, loss_w_dcy=0.0,
                     frcnn_nb_proposals=16, frcnn_nb_pre_nms=64):
        helper = ModelHelper()
        assert helper.forward_w_labels
        learner = FullPrecLearner(None, helper)
        state, tx, _ = learner.init_state()
        train_step = learner.build_train_step(tx)
        iterator = learner.dataset_train.build()
        losses = []
        for idx in range(6):
            state, metrics = train_step(state, next(iterator),
                                        jax.random.fold_in(jax.random.PRNGKey(0), idx))
            m = jax.device_get(metrics)
            losses.append(float(m['rpn_loss']) + float(m['rcnn_loss']))
            assert np.isfinite(losses[-1])
        result = helper.evaluate_map(learner.model, state, learner.dataset_eval,
                                     nb_batches=1)
        assert 'mAP' in result and 0.0 <= result['mAP'] <= 1.0
