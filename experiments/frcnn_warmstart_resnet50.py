"""Faster-RCNN-ResNet-50 via the reference's actual recipe: warm-start.

The reference never trains its FRCNN ResNet trunk from scratch — it grafts a
classification checkpoint into the backbone and finetunes
(/root/reference/nets/faster_rcnn_at_pascalvoc.py:471-513, backbone restore).
From-scratch synthetic convergence is demonstrated for the shallower trunks
(experiments/frcnn_synthetic_map.py, resnet18 mAP ~0.49); this drill runs the
reference-fidelity path for resnet50:

1. train a ResNet-50 classifier on the 16-class synthetic set (short),
2. graft it into the FRCNN backbone through ModelHelper.warm_start
   (restore_intersecting with the ``backbone/`` prefix map),
3. finetune the detector and score synthetic-VOC mAP.

Run: python experiments/frcnn_warmstart_resnet50.py [cls_steps] [det_steps]
"""

import sys
import time

import jax

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def main(cls_steps: int = 400, det_steps: int = 5000):
    import pocketflow_tpu  # noqa: F401
    from pocketflow_tpu.config import FLAGS
    from pocketflow_tpu.core import checkpoint as ckpt_lib

    cls_ckpt = '/tmp/pf_frcnn_ws/cls/model.ckpt'

    # ---- stage 1: classifier trunk on synthetic 16-class ILSVRC ----
    with FLAGS.scope(batch_size=32, nb_classes=16, nb_smpls_train=2048,
                     nb_smpls_eval=256, nb_epochs_rat=0.15,
                     lrn_rate_init=0.05, resnet_size=50,
                     save_path=cls_ckpt, log_dir='/tmp/pf_frcnn_ws/logs',
                     summ_step=10**9, save_step=10**9):
        from pocketflow_tpu.learners.full_precision import FullPrecLearner
        from pocketflow_tpu.nets.resnet_at_ilsvrc12 import ModelHelper as ClsHelper
        learner = FullPrecLearner(None, ClsHelper(resnet_size=50))
        state, tx, _ = learner.init_state()
        step = learner.build_train_step(tx)
        it = learner.dataset_train.build()
        t0 = time.time()
        for i in range(cls_steps):
            state, m = step(state, learner.put_batch(next(it)),
                            jax.random.fold_in(jax.random.PRNGKey(0), i))
        mm = jax.device_get(m)
        print('classifier: %d steps, final train acc %.3f (%.0fs)'
              % (cls_steps, float(mm['accuracy']), time.time() - t0), flush=True)
        ckpt_lib.save(cls_ckpt, state, cls_steps)

    # ---- stage 2: graft + detector finetune ----
    FLAGS.override(frcnn_backbone='resnet50')
    FLAGS.override(synthetic_data=True, batch_size=16, batch_size_eval=16,
                   nb_smpls_train=256, nb_smpls_eval=64, nb_epochs_rat=15.0,
                   lrn_rate_init=0.005, voc_image_size=64, nb_bboxs_max=8,
                   loss_w_dcy=0.0, frcnn_nb_proposals=32, frcnn_nb_pre_nms=128,
                   frcnn_roi_batch=32, compute_dtype='float32',
                   save_path=cls_ckpt,
                   log_dir='/tmp/pf_frcnn_ws/logs',
                   summ_step=10**9, save_step=10**9)
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.nets.faster_rcnn_at_pascalvoc import ModelHelper
    helper = ModelHelper()
    learner = FullPrecLearner(None, helper)
    state, tx, _ = learner.init_state()

    import numpy as np
    before = np.asarray(jax.device_get(
        state.params['backbone']['conv_init']['kernel']), np.float32)
    state = helper.warm_start(state)
    after = np.asarray(jax.device_get(
        state.params['backbone']['conv_init']['kernel']), np.float32)
    assert not np.allclose(before, after), 'warm start grafted nothing'
    print('warm start: backbone grafted from %s' % cls_ckpt, flush=True)

    step = learner.build_train_step(tx)
    it = learner.dataset_train.build()
    t0 = time.time()
    for i in range(det_steps):
        state, m = step(state, next(it),
                        jax.random.fold_in(jax.random.PRNGKey(1), i))
        if (i + 1) % 200 == 0:
            mm = jax.device_get(m)
            print('step %d: rpn %.3f rcnn %.3f acc %.3f (%.0fs)'
                  % (i + 1, mm['rpn_loss'], mm['rcnn_loss'], mm['accuracy'],
                     time.time() - t0), flush=True)
    res = helper.evaluate_map(learner.model, state, learner.dataset_eval)
    print('mAP: %.4f' % res['mAP'])
    assert res['mAP'] > 0.3, 'warm-started FRCNN-ResNet50 failed to converge'
    return res


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400,
         int(sys.argv[2]) if len(sys.argv) > 2 else 5000)
