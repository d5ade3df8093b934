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


@pytest.mark.slow
def test_faster_rcnn_forward_and_train_smoke(tmp_path):
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.nets.faster_rcnn_at_pascalvoc import ModelHelper
    with FLAGS.scope(batch_size=2, batch_size_eval=2, nb_smpls_train=64,
                     nb_smpls_eval=16, nb_epochs_rat=0.01, lrn_rate_init=0.01,
                     voc_image_size=64, nb_bboxs_max=8, loss_w_dcy=0.0,
                     frcnn_nb_proposals=16, frcnn_nb_pre_nms=64,
                     frcnn_roi_batch=32, frcnn_backbone='resnet18'):
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


def test_sample_rois_respects_fg_fraction():
    """proposal_target_layer semantics: fixed ROI minibatch, fg fraction."""
    from pocketflow_tpu.nets.detection import faster_rcnn as frcnn
    gt_boxes = jnp.asarray([[0.1, 0.1, 0.5, 0.5]], jnp.float32)
    gt_classes = jnp.asarray([7.0])
    gt_valid = jnp.asarray([1.0])
    # 4 fg candidates (high IoU), 12 far-away background proposals
    fg_props = jnp.asarray([[0.1, 0.1, 0.5, 0.52], [0.12, 0.1, 0.5, 0.5],
                            [0.1, 0.12, 0.52, 0.5], [0.11, 0.11, 0.5, 0.5]])
    bg_props = jnp.stack([jnp.asarray([0.6, 0.6, 0.9, 0.9]) + 0.005 * i
                          for i in range(12)])
    props = jnp.concatenate([fg_props, bg_props]).astype(jnp.float32)
    valid = jnp.ones(16, bool)
    roi_idx, cls_t, box_t, fg, vmask = frcnn.sample_rois(
        props, valid, gt_boxes, gt_classes, gt_valid, jax.random.PRNGKey(0),
        nb_rois=8, fg_fraction=0.25)
    assert roi_idx.shape == (8,) and cls_t.shape == (8,)
    assert float(jnp.sum(fg)) == 2.0  # exactly fg_fraction * nb_rois
    # the fg slots point at actual foreground proposals with the gt class
    fg_slots = np.nonzero(np.asarray(fg) > 0.5)[0]
    assert all(int(roi_idx[s]) < 4 for s in fg_slots)
    assert all(int(cls_t[s]) == 7 for s in fg_slots)
    # background slots carry class 0 and are valid (IoU < fg threshold)
    bg_slots = np.nonzero(np.asarray(fg) < 0.5)[0]
    assert all(int(cls_t[s]) == 0 for s in bg_slots)
    assert float(jnp.sum(vmask)) == 8.0


def test_parse_detections_class_specific_boxes():
    """Faster-RCNN eval decodes per-class boxes [A, C, 4]."""
    from pocketflow_tpu.nets.detection import nms as nms_lib
    probs = np.zeros((3, 3), np.float32)
    probs[0, 1] = 0.9   # roi 0 -> class 1
    probs[1, 2] = 0.8   # roi 1 -> class 2
    boxes = np.zeros((3, 3, 4), np.float32)
    boxes[0, 1] = [0.1, 0.1, 0.3, 0.3]
    boxes[1, 2] = [0.5, 0.5, 0.9, 0.9]
    dets = nms_lib.parse_detections(probs, boxes, score_threshold=0.05)
    assert len(dets) == 2
    assert dets[0]['class'] == 1
    np.testing.assert_allclose(dets[0]['box'], [0.1, 0.1, 0.3, 0.3], rtol=1e-6)
    assert dets[1]['class'] == 2
    np.testing.assert_allclose(dets[1]['box'], [0.5, 0.5, 0.9, 0.9], rtol=1e-6)


def test_frcnn_resnet_backbone_policies_reach_convs():
    """The real-ResNet FRCNN exposes its convs to compression policies:
    conv_layer_specs (the CP family's discovery trace) must see the backbone
    stages, the lateral/RPN convs — i.e. channel pruning can reach the model
    (reference faster_rcnn_at_pascalvoc.py:471-513 prunes its ResNet)."""
    import jax
    from pocketflow_tpu.learners.channel_pruning.channel_pruner import (
        conv_layer_specs)
    from pocketflow_tpu.nets.faster_rcnn_at_pascalvoc import ModelHelper
    with FLAGS.scope(voc_image_size=64, nb_bboxs_max=4, batch_size=2,
                     batch_size_eval=2, nb_smpls_train=32, nb_smpls_eval=16,
                     frcnn_nb_proposals=8, frcnn_nb_pre_nms=32,
                     frcnn_backbone='resnet18'):
        helper = ModelHelper()
        model = helper.create_model()
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), x, train=False))()
        specs = conv_layer_specs(model, variables['params'],
                                 variables.get('batch_stats', {}), x)
        paths = {s['path'] for s in specs}
        # ImageNet-stem names (warm-startable from a classification ckpt)
        assert any('backbone/conv_init' in p for p in paths)
        assert any('backbone/stage1_block0/conv1' in p for p in paths)
        assert any('backbone/stage3_block1/conv2' in p for p in paths)
        assert any('rpn_conv' in p for p in paths)
        assert any('lateral' in p for p in paths)
        # resnet18 stages 1-3: 2 blocks each, 2 convs per block (+1 sc per
        # downsampling stage) + stem + 2 laterals + rpn convs
        assert len(specs) >= 18


@pytest.mark.slow
def test_channel_pruned_frcnn_trains_data_parallel(tmp_path):
    """BASELINE.json config #5: channel-pruned Faster-RCNN detection,
    multi-chip data-parallel.  The conftest mesh spans 8 virtual devices on
    the 'data' axis; the channel learner's full pipeline (baseline restore ->
    LASSO selection -> reconstruction -> global finetune) must run sharded
    over it and land pruned kernels with finite losses.  The mAP evidence for
    this config lives in experiments/frcnn_compression_parity.py."""
    from pocketflow_tpu.core import mesh as mesh_lib
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.learners.channel_pruning import ChannelPrunedLearner
    from pocketflow_tpu.nets.faster_rcnn_at_pascalvoc import ModelHelper

    assert mesh_lib.global_mesh().shape['data'] == 8
    with FLAGS.scope(batch_size=16, batch_size_eval=16, nb_smpls_train=64,
                     nb_smpls_eval=16, nb_epochs_rat=0.02, lrn_rate_init=0.01,
                     voc_image_size=64, nb_bboxs_max=4, loss_w_dcy=0.0,
                     frcnn_nb_proposals=8, frcnn_nb_pre_nms=32,
                     frcnn_roi_batch=8, frcnn_backbone='small'):
        FullPrecLearner(None, ModelHelper()).train()
        with FLAGS.scope(cp_prune_option='uniform',
                         cp_uniform_preserve_ratio=0.5,
                         cp_nb_batches=1, cp_nb_points_per_layer=2,
                         cp_lasso_nb_iters=8, cp_nb_iters_ft_ratio=0.2,
                         cp_channel_pruned_path=str(
                             tmp_path / 'cp' / 'model.ckpt')):
            learner = ChannelPrunedLearner(None, ModelHelper())
            state = learner.train()
            # pruned input channels actually landed in a mid-trunk kernel
            zeroed = 0
            for spec in learner.specs:
                node = state.params
                for part in spec['path'].split('/'):
                    node = node[part]
                k = np.asarray(jax.device_get(node['kernel']))
                if k.ndim == 4 and k.shape[2] >= 8:
                    norms = np.linalg.norm(
                        k.transpose(2, 0, 1, 3).reshape(k.shape[2], -1),
                        axis=1)
                    zeroed += int(np.sum(norms == 0.0))
            assert zeroed > 0, 'no channel was pruned anywhere'
            metrics = learner.run_eval_loop(state, learner.build_eval_step())
            assert np.isfinite(float(metrics['loss']))


@pytest.mark.slow
def test_frcnn_warm_start_grafts_classifier_trunk(tmp_path):
    """The reference's FRCNN recipe: graft a classification checkpoint into
    the detection backbone (faster_rcnn_at_pascalvoc.py backbone restore).
    The trunk's module names match nets/resnet.py's ImageNet models, so
    restore_intersecting with the backbone/ prefix map must move the
    classifier's stem + stage weights into the detector."""
    from pocketflow_tpu.core import checkpoint as ckpt_lib
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.nets.faster_rcnn_at_pascalvoc import ModelHelper
    from pocketflow_tpu.nets.resnet_at_ilsvrc12 import ModelHelper as ClsHelper

    cls_ckpt = str(tmp_path / 'cls' / 'model.ckpt')
    with FLAGS.scope(resnet_size=18, nb_classes=16, batch_size=2,
                     batch_size_eval=2, nb_smpls_train=64, nb_smpls_eval=64,
                     save_path=cls_ckpt):
        learner = FullPrecLearner(None, ClsHelper(resnet_size=18))
        cls_state, _, _ = learner.init_state()
        ckpt_lib.save(cls_ckpt, cls_state, 1)
        cls_kernel = np.asarray(jax.device_get(
            cls_state.params['conv_init']['kernel']), np.float32)

    with FLAGS.scope(batch_size=2, batch_size_eval=2, nb_smpls_train=32,
                     nb_smpls_eval=16, voc_image_size=64, nb_bboxs_max=4,
                     frcnn_nb_proposals=8, frcnn_nb_pre_nms=32,
                     frcnn_roi_batch=8, frcnn_backbone='resnet18',
                     save_path=cls_ckpt):
        helper = ModelHelper()
        det = FullPrecLearner(None, helper)
        state, _, _ = det.init_state()
        state = helper.warm_start(state)
        got = np.asarray(jax.device_get(
            state.params['backbone']['conv_init']['kernel']), np.float32)
        np.testing.assert_array_equal(got, cls_kernel)
        got_s3 = np.asarray(jax.device_get(
            state.params['backbone']['stage3_block1']['conv2']['kernel']))
        want_s3 = np.asarray(jax.device_get(
            cls_state.params['stage3_block1']['conv2']['kernel']))
        np.testing.assert_array_equal(got_s3, want_s3)
