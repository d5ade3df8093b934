"""Faster-RCNN synthetic-VOC convergence run (VERDICT r1 #8 done criterion).

Trains the two-level Faster-RCNN on the synthetic rectangle-detection set and
scores full-set VOC mAP.  Measured on the TPU chip:

    2026-08-16 (compact 'small' trunk): mAP 0.68 single-level / 0.56 FPN
      level-assigned pooling at 2000 steps.
    2026-08-17 (real resnet18 trunk, from scratch): mAP 0.49 at 2000 steps,
      fg-roi accuracy 0.81, training ~104 s once compiled.

Run: python experiments/frcnn_synthetic_map.py [nb_steps] [backbone]

The reference ALWAYS warm-starts the FRCNN trunk from a classification
checkpoint (faster_rcnn_at_pascalvoc.py backbone restore); from-scratch
synthetic convergence is therefore demonstrated on the shallower trunks
(small/resnet18) while resnet50 is exercised through the warm-start path +
smoke tests.
"""

import sys
import time

import jax

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def main(nb_steps: int = 2000, backbone: str = 'resnet18'):
    import pocketflow_tpu  # noqa: F401
    from pocketflow_tpu.config import FLAGS
    FLAGS.override(frcnn_backbone=backbone)
    FLAGS.override(synthetic_data=True, batch_size=16, batch_size_eval=16,
                   nb_smpls_train=256, nb_smpls_eval=64, nb_epochs_rat=5.0,
                   lrn_rate_init=0.02, voc_image_size=64, nb_bboxs_max=8,
                   loss_w_dcy=0.0, frcnn_nb_proposals=32, frcnn_nb_pre_nms=128,
                   frcnn_roi_batch=32, compute_dtype='float32',
                   save_path='/tmp/pf_frcnn/models/model.ckpt',
                   log_dir='/tmp/pf_frcnn/logs',
                   summ_step=10**9, save_step=10**9)
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.nets.faster_rcnn_at_pascalvoc import ModelHelper
    helper = ModelHelper()
    learner = FullPrecLearner(None, helper)
    state, tx, _ = learner.init_state()
    step = learner.build_train_step(tx)
    it = learner.dataset_train.build()
    t0 = time.time()
    for i in range(nb_steps):
        state, m = step(state, next(it),
                        jax.random.fold_in(jax.random.PRNGKey(0), i))
        if (i + 1) % 200 == 0:
            mm = jax.device_get(m)
            print('step %d: rpn %.3f rcnn %.3f acc %.3f (%.0fs)'
                  % (i + 1, mm['rpn_loss'], mm['rcnn_loss'], mm['accuracy'],
                     time.time() - t0), flush=True)
    res = helper.evaluate_map(learner.model, state, learner.dataset_eval)
    print('mAP: %.4f' % res['mAP'])
    assert res['mAP'] > 0.3, 'FRCNN failed to converge on synthetic VOC'
    return res


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000,
         sys.argv[2] if len(sys.argv) > 2 else 'resnet18')
