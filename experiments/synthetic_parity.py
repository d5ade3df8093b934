"""Synthetic accuracy-parity sweep: every learner on ResNet-20 @ CIFAR-10.

BASELINE.md's accuracy tables need the real datasets (not mounted in this
environment); this sweep is the closest in-container proxy: the synthetic
CIFAR fallback is learnable (class-conditioned patterns), so a correct
compression pipeline must (a) train to high accuracy and (b) hold it under
compression at the reference's published operating points (75% sparsity,
50% channels, 4/8-bit weights).

    python experiments/synthetic_parity.py          # ~10 min on one chip
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import pocketflow_tpu  # noqa: F401
from pocketflow_tpu.config import FLAGS


def run_sweep(workdir=None, quick=False):
    workdir = workdir or tempfile.mkdtemp(prefix='pf_parity_')
    results = {}
    base = dict(
        synthetic_data=True, compute_dtype='bfloat16', rand_seed=0,
        batch_size=128, batch_size_eval=128, nb_smpls_train=4096,
        nb_smpls_eval=1024, lrn_rate_init=0.1, summ_step=100, save_step=10**6,
        save_path=os.path.join(workdir, 'models/model.ckpt'),
        log_dir=os.path.join(workdir, 'logs'),
        resnet_size=20, nb_epochs_rat=0.05 if quick else 0.2)
    FLAGS.override(**base)

    from pocketflow_tpu.nets.resnet_at_cifar10 import ModelHelper
    from pocketflow_tpu.learners import create_learner

    def evaluate(learner, state, eval_step=None):
        step = eval_step or learner.build_eval_step()
        return learner.run_eval_loop(state, step)

    # 1. full-precision baseline (checkpoint feeds every compression learner)
    learner = create_learner(None, ModelHelper(), learner_name='full-prec')
    state = learner.train()
    results['full-prec'] = evaluate(learner, state)['accuracy']

    # 2. weight sparsification @ 75% (reference's WS headline point)
    with FLAGS.scope(ws_prune_ratio=0.75, ws_prune_ratio_prtl='uniform',
                     ws_mask_update_step=20,
                     ws_save_path=os.path.join(workdir, 'ws/model.ckpt')):
        learner = create_learner(None, ModelHelper(), learner_name='weight-sparse')
        state = learner.train()
        metrics = learner.run_eval_loop(state, learner.build_sparse_eval_step())
        results['weight-sparse@75%'] = metrics['accuracy']
        results['weight-sparse@75%_pr'] = metrics['pr_msk']

    # 3. uniform quantization @ 4-bit channel buckets
    with FLAGS.scope(uql_weight_bits=4, uql_use_buckets=True,
                     uql_bucket_type='channel', uql_quant_epochs=30,
                     uql_quantize_all_layers=False,
                     uql_save_quant_model_path=os.path.join(workdir, 'uql/model.ckpt')):
        learner = create_learner(None, ModelHelper(), learner_name='uniform')
        state = learner.train()
        results['uniform@4bit'] = learner.run_eval_loop(
            state, learner.build_quant_eval_step())['accuracy']

    # 4. deployment QAT 8/8 (uniform-tf)
    with FLAGS.scope(uql_quant_epochs=30, uqtf_quant_delay=0,
                     uqtf_freeze_bn_delay=None,
                     uqtf_save_path=os.path.join(workdir, 'uqtf/model.ckpt')):
        learner = create_learner(None, ModelHelper(), learner_name='uniform-tf')
        state = learner.train()
        results['uniform-tf@8/8'] = learner.run_eval_loop(
            state, learner.build_qat_eval_step())['accuracy']

    # 5. channel pruning (PGD) @ 50%
    with FLAGS.scope(cpg_prune_ratio=0.5, cpg_skip_ht_layers=True,
                     cpg_nb_iters_layer=24 if quick else 60,
                     cpg_save_path=os.path.join(workdir, 'cpg/model.ckpt')):
        learner = create_learner(None, ModelHelper(), learner_name='chn-pruned-gpu')
        state = learner.train()
        results['chn-pruned-gpu@50%'] = learner.run_eval_loop(
            state, learner.build_pruned_eval_step())['accuracy']

    # 6. non-uniform quantization @ 4-bit codebooks
    with FLAGS.scope(nuql_weight_bits=4, nuql_quant_epochs=30,
                     nuql_opt_mode='both', nuql_quantize_all_layers=False,
                     nuql_save_quant_model_path=os.path.join(workdir, 'nuql/model.ckpt')):
        learner = create_learner(None, ModelHelper(), learner_name='non-uniform')
        state = learner.train()
        results['non-uniform@4bit'] = learner.run_eval_loop(
            state, learner.build_quant_eval_step())['accuracy']

    # 7. LASSO channel pruning (He-2017) @ 60% preserve, uniform
    with FLAGS.scope(cp_prune_option='uniform', cp_uniform_preserve_ratio=0.6,
                     cp_nb_batches=6, cp_nb_points_per_layer=8,
                     cp_nb_iters_ft_ratio=0.3,
                     cp_channel_pruned_path=os.path.join(workdir, 'cp/model.ckpt')):
        learner = create_learner(None, ModelHelper(), learner_name='channel')
        state = learner.train()
        results['channel@60%'] = learner.run_eval_loop(
            state, learner.build_eval_step())['accuracy']

    # 8. remastered channel pruning @ 50%
    with FLAGS.scope(cpr_prune_ratio=0.5, cpr_skip_frst_layer=True,
                     cpr_nb_smpls=512, cpr_nb_crops_per_smpl=6,
                     cpr_ista_nb_iters=60, cpr_lstsq_nb_iters=60,
                     cp_nb_batches=6,
                     cpr_save_path=os.path.join(workdir, 'cpr/model.ckpt')):
        learner = create_learner(None, ModelHelper(), learner_name='chn-pruned-rmt')
        state = learner.train()
        results['chn-pruned-rmt@50%'] = learner.run_eval_loop(
            state, learner.build_eval_step())['accuracy']

    # 9. discrimination-aware channel pruning @ 50%
    with FLAGS.scope(dcp_prune_ratio=0.5, dcp_nb_stages=2,
                     dcp_nb_iters_block=20 if quick else 40,
                     dcp_nb_iters_layer=1 if quick else 2,
                     dcp_save_path=os.path.join(workdir, 'dcp/model.ckpt')):
        learner = create_learner(None, ModelHelper(), learner_name='dis-chn-pruned')
        state = learner.train()
        results['dis-chn-pruned@50%'] = learner.run_eval_loop(
            state, learner.build_eval_step())['accuracy']

    return results


if __name__ == '__main__':
    quick = '--quick' in sys.argv
    results = run_sweep(quick=quick)
    print(json.dumps({k: round(float(v), 4) for k, v in results.items()},
                     indent=2))
