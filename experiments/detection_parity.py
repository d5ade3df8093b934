"""Detection-family accuracy-parity strip: SSD-VGG mAP deltas under
compression (synthetic VOC, full-set eval).

The classification parity harness (`synthetic_parity.py`) covers all nine
learners on ResNet-20 plus a MobileNet-v1 strip, but the reference also
gates compression ON DETECTION models: its test-case matrix runs the
weight-sparse / channel-pruning / quantization learners on SSD-VGG@VOC
(`/root/reference/docs/docs/test_cases.md`, ssd rows) and the detection
helpers implement `dump_n_eval` mAP scoring precisely so compressed
detectors can be judged on the metric that matters.  The repo's slow tests
already assert the mechanics (finite losses, target prune ratios); this
strip adds the missing EVIDENCE layer: full-set synthetic-VOC mAP for the
baseline and each compressed variant, with locked regression bands in the
style of the classification harness.

Operating points mirror the slow-test/reference configs: WS@50% uniform,
UQ@8bit (policy-applied eval forward), LASSO channel @0.6 preserve, PGD
chn-pruned-gpu @40%.

Run on the chip:  python experiments/detection_parity.py --publish
Quick CPU smoke:  python experiments/detection_parity.py --quick
Validate stored:  python experiments/detection_parity.py --check-file <json>
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('JAX_PLATFORMS'):
    # the container's sitecustomize pre-imports jax with the axon platform
    # baked in; honor an explicit JAX_PLATFORMS=cpu (same idiom as main.py)
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

import pocketflow_tpu  # noqa: F401
from pocketflow_tpu.config import FLAGS

# Recipe (validated on the v5e chip 2026-08-19, docs/performance.md SSD
# section): 8192 non-overlapping synthetic-VOC samples, lr 0.04 (effective
# 0.005 at batch 16 / norm 128), wd 5e-4, 120 epochs with the cls-loss
# warm-up — from-scratch baseline mAP 0.9326; the old 256-sample/lr-0.01
# config memorized (train 0.84 / eval 0.03).  Compressed points restore the
# trained baseline and finetune at nb_epochs_rat=0.5.  WS/UQ disable the
# cls warm-up (gentle perturbations; measured deltas -0.0235 / -0.0021);
# CP/CPG keep it — pruning+reconstruction wreck the detector enough that
# full CE from step 0 NaNs (CP) or background-locks (CPG) the finetune.
# Bands give ~2x headroom over measured delta + run-to-run noise (~±0.01),
# floor 0.06 (evidence: experiments/results/detection_parity.json).
BASELINE_BAND = (0.80, 1.00)
LOCKED_MAX_DELTA = {
    'weight-sparse@50%': 0.06,
    'uniform@8bit': 0.06,
    'channel@60%preserve': 0.10,
    'chn-pruned-gpu@40%': 0.10,
}
# Two-sided bands (VERDICT r4 weak #3): on this synthetic strip several
# compressed points BEAT the baseline (WS -0.0235, CPG -0.0365) because
# masking/group-shrinkage act as regularizers on an 8192-sample task — the
# baselines are honest (full schedule, tuned wd) but the task is small
# enough that extra regularization still helps, unlike the reference's
# real-VOC points which never beat baseline.  An "improvement" far beyond
# that measured regularization effect is therefore ALSO a red flag (e.g. a
# train-pipeline regression that quietly degrades the baseline): lock a
# lower bound at measured-best-improvement (-0.0365) + noise (±0.01) with
# the usual ~2x margin.
LOCKED_MIN_DELTA = -0.09


def check_results(results):
    """Return a list of band violations (empty == healthy)."""
    violations = []
    base = results.get('full-prec_mAP')
    if base is None:
        return ['full-prec baseline mAP missing from results']
    # quick mode trains at nb_epochs_rat=0.05 — the full baseline band is
    # unreachable there, so only sanity-check that the eval produced a number
    quick = bool(results.get('_quick'))
    band = (0.0, 1.0) if quick else BASELINE_BAND
    if not band[0] <= base <= band[1]:
        violations.append('full-prec mAP %.4f outside band [%.2f, %.2f]'
                          % (base, *band))
    for key, bound in LOCKED_MAX_DELTA.items():
        delta = results.get(key + '_delta')
        if delta is None:
            if not results.get('_quick'):
                violations.append('%s missing from results' % key)
            continue
        if delta > bound:
            violations.append('%s mAP delta %.4f exceeds locked band %.2f'
                              % (key, delta, bound))
        if not quick and delta < LOCKED_MIN_DELTA:
            violations.append(
                '%s mAP delta %.4f "improves" past the two-sided floor %.2f '
                '— suspect a baseline/train-pipeline regression'
                % (key, delta, LOCKED_MIN_DELTA))
    return violations


def run_strip(workdir=None, quick=False, only=None):
    """only: optional subset of point keys {'baseline','ws','uq','channel',
    'cpg'} — reuse an existing workdir's trained baseline checkpoint and
    re-measure just those points (evidence provenance stays one baseline)."""
    workdir = workdir or tempfile.mkdtemp(prefix='pf_det_parity_')
    want = lambda key: only is None or key in only
    results = {'_quick': bool(quick)}
    FLAGS.override(
        synthetic_data=True, compute_dtype='bfloat16', rand_seed=0,
        batch_size=16, batch_size_eval=16,
        nb_smpls_train=512 if quick else 8192,
        nb_smpls_eval=64 if quick else 256,
        voc_image_size=64, nb_bboxs_max=8,
        lrn_rate_init=0.04, loss_w_dcy=5e-4,
        summ_step=2000, save_step=10 ** 6,
        save_path=os.path.join(workdir, 'models/model.ckpt'),
        log_dir=os.path.join(workdir, 'logs'),
        nb_epochs_rat=0.05 if quick else 1.0)
    # compressed points finetune FROM the trained baseline: half schedule,
    # no cls-loss re-ramp (re-ramping on a trained net just un-trains it)
    ft_rat = 0.05 if quick else 0.5

    from pocketflow_tpu.learners import create_learner
    from pocketflow_tpu.nets.vgg_at_pascalvoc import ModelHelper
    from pocketflow_tpu.nets.detection.eval_loop import run_detection_eval

    def full_map(learner, state, policy=None):
        helper = learner.model_helper
        fwd = (lambda v, x: helper.forward_eval(learner.model, v, x,
                                                policy=policy))
        return float(run_detection_eval(
            helper, learner.model, state, helper.dataset_eval, fwd)['mAP'])

    # 1. full-precision SSD baseline (checkpoint feeds the learners below)
    learner = create_learner(None, ModelHelper(), learner_name='full-prec')
    if want('baseline'):
        state = learner.train()
    else:
        state, restored = learner.restore_baseline(
            learner.init_state()[0])
        assert restored, ('--only without a trained baseline checkpoint in '
                          '--workdir %s' % workdir)
    baseline = full_map(learner, state)
    results['full-prec_mAP'] = baseline
    print(json.dumps({'full-prec_mAP': round(baseline, 4)}), flush=True)

    def record(key, m):
        results[key + '_mAP'] = m
        results[key + '_delta'] = round(baseline - m, 4)
        print(json.dumps({key + '_mAP': round(m, 4),
                          'delta': results[key + '_delta']}), flush=True)

    # 2. weight sparsification @ 50% (test_cases.md ssd weight-sparse row)
    if want('ws'):
        with FLAGS.scope(ws_prune_ratio=0.5, ws_prune_ratio_prtl='uniform',
                         ws_mask_update_step=20,
                         nb_epochs_rat=ft_rat, nb_iters_cls_wmup=1,
                         ws_save_path=os.path.join(workdir, 'ws/model.ckpt')):
            learner = create_learner(None, ModelHelper(),
                                     learner_name='weight-sparse')
            state = learner.train()
            record('weight-sparse@50%', full_map(learner, state))

    # 3. uniform quantization @ 8 bit — mAP scored through the SAME policy
    # forward the QAT eval uses (fake-quant applied at eval time)
    if want('uq'):
        with FLAGS.scope(uql_weight_bits=8, uql_use_buckets=True,
                         uql_bucket_type='channel', uql_quant_epochs=30,
                         uql_quantize_all_layers=False,
                         nb_epochs_rat=ft_rat, nb_iters_cls_wmup=1,
                         uql_save_quant_model_path=os.path.join(
                             workdir, 'uql/model.ckpt')):
            learner = create_learner(None, ModelHelper(),
                                     learner_name='uniform')
            state = learner.train()
            record('uniform@8bit',
                   full_map(learner, state,
                            policy=learner._policy_fn()(state)))

    if not quick and want('channel'):
        # 4. LASSO channel pruning @ 0.6 preserve (BASELINE config #5 point).
        # Reference-scale reconstruction sampling (30 batches x 10 points,
        # channel_pruner.py defaults): the 4x8 smoke sizing under-determines
        # the per-layer regression on this net (rows << c_sel*h*w).  The
        # cls-loss warm-up stays ON for the finetune: unlike WS/UQ, pruning +
        # reconstruction perturbs the detector enough that the full
        # hard-negative-mined CE from step 0 locks it into the background
        # basin (the same failure the from-scratch recipe hits).
        with FLAGS.scope(cp_prune_option='uniform',
                         cp_uniform_preserve_ratio=0.6,
                         cp_nb_batches=30, cp_nb_points_per_layer=10,
                         cp_nb_iters_ft_ratio=1.0, cp_lasso_nb_iters=120,
                         nb_epochs_rat=ft_rat,
                         cp_channel_pruned_path=os.path.join(
                             workdir, 'cp/model.ckpt')):
            learner = create_learner(None, ModelHelper(),
                                     learner_name='channel')
            state = learner.train()
            record('channel@60%preserve', full_map(learner, state))

    if not quick and want('cpg'):
        # 5. PGD channel pruning @ 40% (BN-free backbone — the
        # scale-invariant reconstruction path, VERDICT r2 #5).  400 PGD +
        # 400 reconstruction iterations: at the test-suite's 60/60 sizing
        # the annealed group-LASSO leaves per-layer reconstruction errors
        # of ~1e8 on this fully-trained VGG-SSD and the finetune starts from
        # a functionally dead detector (each iteration is one batch through
        # the capture forward — 400 of them cost seconds on the chip).
        with FLAGS.scope(cpg_prune_ratio=0.4, cpg_skip_ht_layers=True,
                         cpg_nb_iters_layer=400,
                         nb_epochs_rat=ft_rat,
                         cpg_save_path=os.path.join(workdir,
                                                    'cpg/model.ckpt')):
            learner = create_learner(None, ModelHelper(),
                                     learner_name='chn-pruned-gpu')
            state = learner.train()
            record('chn-pruned-gpu@40%', full_map(learner, state))

    return results


def _check_and_exit(out):
    violations = check_results(out)
    if violations:
        print('DETECTION PARITY BAND VIOLATIONS:')
        for v in violations:
            print('  ' + v)
        sys.exit(1)
    print('detection parity bands: all %d points within locked bands'
          % len(LOCKED_MAX_DELTA))


def _argval(flag):
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return None


if __name__ == '__main__':
    if '--check-file' in sys.argv:
        with open(_argval('--check-file')) as fin:
            _check_and_exit(json.load(fin))
        sys.exit(0)
    only = _argval('--only')
    only = set(only.split(',')) if only else None
    out = run_strip(workdir=_argval('--workdir'),
                    quick='--quick' in sys.argv, only=only)
    out = {k: (round(float(v), 4) if not isinstance(v, (bool, str)) else v)
           for k, v in out.items()}
    print(json.dumps(out, indent=2))
    if '--publish' in sys.argv and '--quick' not in sys.argv:
        res_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'results')
    else:
        if '--publish' in sys.argv:
            print('NOTE: --publish is ignored under --quick (quick results '
                  'never overwrite the committed evidence)')
        res_dir = os.environ.get('PF_PARITY_OUT', '/tmp/pf_parity_results')
    os.makedirs(res_dir, exist_ok=True)
    path = os.path.join(res_dir, 'detection_parity.json')
    if only and os.path.exists(path):
        # subset re-measure: merge into the stored evidence (the reused
        # baseline checkpoint keeps provenance consistent)
        with open(path) as fin:
            merged = json.load(fin)
        merged.update(out)
        out = merged
    with open(path, 'w') as fout:
        json.dump(out, fout, indent=2)
    print('results written to %s%s' % (path, '' if '--publish' in sys.argv
                                       else ' (use --publish to update the '
                                            'committed evidence)'))
    if '--check' in sys.argv:
        _check_and_exit(out)
