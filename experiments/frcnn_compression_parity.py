"""Faster-RCNN compression parity strip: compressed-vs-baseline mAP on
synthetic VOC (BASELINE.json config #5's detection-compression evidence).

The reference's test matrix runs the compression learners on BOTH detection
models (/root/reference/docs/docs/test_cases.md, fasterrcnn rows); round 3
covered SSD only.  This strip trains an FRCNN-ResNet18 baseline in the
generalizing regime (8192 non-overlapping synthetic-VOC samples — the same
fix that rescued the SSD strip from the 256-sample memorization regime) AND
the hardened texture regime (HARD_REGIME: pixel noise + weaker/smaller
objects — the clean regime saturates FRCNN at mAP 1.0, leaving the bands no
discriminating power), then measures full-set mAP for:

  * weight sparsification @ 50% uniform,
  * LASSO channel pruning @ 60% preserve,

each finetuned from the SAME baseline checkpoint at half schedule.  It also
trains a `small`-trunk baseline under the identical regime — the round-3
backbone-inversion probe (VERDICT r3 weak #4): resnet18 scored 0.49 vs the
small trunk's 0.68 on the old 256-sample drill, a memorization artifact the
generalizing regime is expected to remove.

Data parallelism: the strip itself runs single-chip; the multi-device
data-parallel channel-pruned-FRCNN path is locked by
tests/test_faster_rcnn.py::test_channel_pruned_frcnn_trains_data_parallel
on the 8-device CPU mesh, and 2-process multi-host detection eval by
tests/test_multihost.py.

Run on the chip:  python experiments/frcnn_compression_parity.py --publish
Baseline probe:   python experiments/frcnn_compression_parity.py --probe [backbone]
Quick CPU smoke:  python experiments/frcnn_compression_parity.py --quick
Validate stored:  python experiments/frcnn_compression_parity.py --check-file <json>
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

import pocketflow_tpu  # noqa: F401
from pocketflow_tpu.config import FLAGS

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'results', 'frcnn_compression_parity.json')

# bands locked from the on-chip publish run (see RESULTS file): baseline must
# stay in the calibrated NON-SATURATING window (the first publish of this
# strip ran the clean-texture regime and saturated at mAP 1.0 everywhere —
# zero discriminating power; the difficulty knobs below pull the achievable
# ceiling down so compression damage is measurable) and compression deltas
# within ~2x the measured drop + eval noise (~±0.02 at 256 eval images).
BASELINE_BAND = (0.55, 0.97)
LOCKED_MAX_DELTA = {
    'weight-sparse@50%': 0.08,
    'channel@60%preserve': 0.12,
}
# two-sided floor (VERDICT r4 weak #3, same rationale as detection_parity):
# WS measured -0.0278 (masking regularizes the 8192-sample task); an
# "improvement" beyond measured-best + noise with 2x margin means the
# baseline or train pipeline regressed, not that compression got better
LOCKED_MIN_DELTA = -0.09

# the hardened synthetic-VOC regime (calibrated via --probe on-chip
# 2026-08-19: noise=48/amp=70 -> mAP 0.981 still near-saturated;
# noise=64/amp=58 -> mAP 0.879, comfortable headroom both ways): weaker
# texture + pixel noise + smaller objects than the SSD strip's defaults,
# so an FRCNN-ResNet18 baseline lands below saturation
HARD_REGIME = dict(synthetic_det_noise=64.0, synthetic_det_amp=58.0,
                   synthetic_det_min_div=6, synthetic_det_max_div=3)


def check_results(results):
    violations = []
    base = results.get('full-prec_mAP')
    if base is None:
        return ['full-prec baseline mAP missing from results']
    quick = bool(results.get('_quick'))
    band = (0.0, 1.0) if quick else BASELINE_BAND
    if not band[0] <= base <= band[1]:
        violations.append('full-prec mAP %.4f outside band [%.2f, %.2f]'
                          % (base, *band))
    for key, bound in LOCKED_MAX_DELTA.items():
        delta = results.get(key + '_delta')
        if delta is None:
            if not quick:
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


def base_flags(workdir, quick):
    return dict(
        synthetic_data=True, compute_dtype='float32', rand_seed=0,
        batch_size=16, batch_size_eval=16,
        nb_smpls_train=512 if quick else 8192,
        nb_smpls_eval=64 if quick else 256,
        voc_image_size=64, nb_bboxs_max=8,
        frcnn_backbone='resnet18', frcnn_nb_proposals=32,
        frcnn_nb_pre_nms=128, frcnn_roi_batch=32,
        lrn_rate_init=0.04, loss_w_dcy=1e-4,
        summ_step=1000, save_step=10 ** 6,
        save_path=os.path.join(workdir, 'models/model.ckpt'),
        log_dir=os.path.join(workdir, 'logs'),
        nb_epochs_rat=0.02 if quick else 1.0,
        **HARD_REGIME)


def _channel_point_flags(workdir, ft_rat):
    # Reference-scale reconstruction sampling (30 batches x 10 points,
    # channel_pruner.py defaults).  The first measure of this point used the
    # 4x8 smoke sizing and lost 0.20 mAP: with rows << c_sel*h*w the
    # per-layer regression is under-determined and the ridge interpolant
    # reconstructs head kernels the finetune cannot recover — the exact
    # failure mode the SSD strip documents (detection_parity.py channel
    # point).  30x10 sampling restores the determined regime.
    return dict(cp_prune_option='uniform', cp_uniform_preserve_ratio=0.6,
                cp_nb_batches=30, cp_nb_points_per_layer=10,
                cp_nb_iters_ft_ratio=1.0, cp_lasso_nb_iters=120,
                nb_epochs_rat=ft_rat,
                cp_channel_pruned_path=os.path.join(workdir, 'cp/model.ckpt'))


def rerun_channel_point(workdir):
    """Re-measure ONLY the channel point against the existing baseline
    checkpoint in `workdir` (written by a previous full run), merging the
    new number into the published RESULTS file."""
    FLAGS.override(**base_flags(workdir, quick=False))
    from pocketflow_tpu.learners import create_learner
    from pocketflow_tpu.nets.faster_rcnn_at_pascalvoc import ModelHelper
    with open(RESULTS) as fin:
        results = json.load(fin)
    baseline = results['full-prec_mAP']
    with FLAGS.scope(**_channel_point_flags(workdir, ft_rat=0.5)):
        cp = create_learner(None, ModelHelper(), learner_name='channel')
        state = cp.train()
        helper = cp.model_helper
        m = float(helper.evaluate_map(cp.model, state, helper.dataset_eval)
                  ['mAP'])
    results['channel@60%preserve_mAP'] = round(m, 4)
    results['channel@60%preserve_delta'] = round(baseline - m, 4)
    print(json.dumps({'channel@60%preserve_mAP': round(m, 4),
                      'delta': results['channel@60%preserve_delta']}),
          flush=True)
    with open(RESULTS, 'w') as fout:
        json.dump(results, fout, indent=2)
    print('results merged into %s' % RESULTS)
    _check_and_exit(results)


def run_strip(workdir=None, quick=False):
    workdir = workdir or tempfile.mkdtemp(prefix='pf_frcnn_parity_')
    results = {'_quick': bool(quick)}
    FLAGS.override(**base_flags(workdir, quick))
    ft_rat = 0.02 if quick else 0.5

    from pocketflow_tpu.learners import create_learner
    from pocketflow_tpu.nets.faster_rcnn_at_pascalvoc import ModelHelper

    def full_map(learner, state):
        helper = learner.model_helper
        return float(helper.evaluate_map(
            learner.model, state, helper.dataset_eval)['mAP'])

    # 1. resnet18 baseline (checkpoint feeds the compressed points)
    t0 = time.time()
    learner = create_learner(None, ModelHelper(), learner_name='full-prec')
    state = learner.train()
    baseline = full_map(learner, state)
    results['full-prec_mAP'] = baseline
    results['baseline_train_s'] = round(time.time() - t0, 1)
    print(json.dumps({'full-prec_mAP': round(baseline, 4)}), flush=True)

    def record(key, m):
        results[key + '_mAP'] = m
        results[key + '_delta'] = round(baseline - m, 4)
        print(json.dumps({key + '_mAP': round(m, 4),
                          'delta': results[key + '_delta']}), flush=True)

    # 2. weight sparsification @ 50% uniform
    with FLAGS.scope(ws_prune_ratio=0.5, ws_prune_ratio_prtl='uniform',
                     ws_mask_update_step=20, nb_epochs_rat=ft_rat,
                     ws_save_path=os.path.join(workdir, 'ws/model.ckpt')):
        ws = create_learner(None, ModelHelper(), learner_name='weight-sparse')
        record('weight-sparse@50%', full_map(ws, ws.train()))

    # 3. LASSO channel pruning @ 60% preserve
    with FLAGS.scope(**_channel_point_flags(workdir, ft_rat)):
        cp = create_learner(None, ModelHelper(), learner_name='channel')
        record('channel@60%preserve', full_map(cp, cp.train()))

    # 4. backbone-inversion probe: the small trunk under the SAME regime
    if not quick:
        with FLAGS.scope(frcnn_backbone='small',
                         save_path=os.path.join(workdir,
                                                'small/model.ckpt')):
            small = create_learner(None, ModelHelper(),
                                   learner_name='full-prec')
            m = full_map(small, small.train())
            results['small-trunk_mAP'] = m
            print(json.dumps({'small-trunk_mAP': round(m, 4)}), flush=True)

    return results


def run_probe(backbone, overrides=None):
    """Baseline-only recipe probe (no compression points); `overrides`
    lets difficulty-knob calibration sweeps run without editing the file:
    --probe resnet18 synthetic_det_noise=60 nb_epochs_rat=0.5"""
    workdir = tempfile.mkdtemp(prefix='pf_frcnn_probe_')
    FLAGS.override(**base_flags(workdir, quick=False))
    FLAGS.override(frcnn_backbone=backbone)
    for k, v in (overrides or {}).items():
        FLAGS.override(**{k: v})
    from pocketflow_tpu.learners import create_learner
    from pocketflow_tpu.nets.faster_rcnn_at_pascalvoc import ModelHelper
    t0 = time.time()
    learner = create_learner(None, ModelHelper(), learner_name='full-prec')
    state = learner.train()
    m = learner.model_helper.evaluate_map(
        learner.model, state, learner.model_helper.dataset_eval)['mAP']
    print(json.dumps({'backbone': backbone, 'mAP': round(float(m), 4),
                      'wall_s': round(time.time() - t0, 1)}))


def _check_and_exit(out):
    violations = check_results(out)
    if violations:
        print('FRCNN PARITY BAND VIOLATIONS:')
        for v in violations:
            print('  ' + v)
        sys.exit(1)
    print('frcnn parity bands: all %d points within locked bands'
          % len(LOCKED_MAX_DELTA))


if __name__ == '__main__':
    if '--check-file' in sys.argv:
        with open(sys.argv[sys.argv.index('--check-file') + 1]) as fin:
            _check_and_exit(json.load(fin))
        sys.exit(0)
    if '--rerun-channel' in sys.argv:
        rerun_channel_point(sys.argv[sys.argv.index('--rerun-channel') + 1])
        sys.exit(0)
    if '--probe' in sys.argv:
        idx = sys.argv.index('--probe')
        rest = sys.argv[idx + 1:]
        backbone = rest[0] if rest and '=' not in rest[0] else 'resnet18'
        overrides = {}
        for tok in rest:
            if '=' in tok:
                k, v = tok.split('=', 1)
                try:
                    overrides[k] = int(v)
                except ValueError:
                    overrides[k] = float(v)
        run_probe(backbone, overrides)
        sys.exit(0)
    out = run_strip(quick='--quick' in sys.argv)
    out = {k: (round(float(v), 4) if not isinstance(v, (bool, str)) else v)
           for k, v in out.items()}
    print(json.dumps(out, indent=2))
    if '--publish' in sys.argv and '--quick' not in sys.argv:
        path = RESULTS
    else:
        if '--publish' in sys.argv:
            print('NOTE: --publish is ignored under --quick')
        path = os.path.join(os.environ.get('PF_PARITY_OUT',
                                           '/tmp/pf_parity_results'),
                            'frcnn_compression_parity.json')
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'w') as fout:
        json.dump(out, fout, indent=2)
    print('results written to %s' % path)
    if '--check' in sys.argv:
        _check_and_exit(out)
