"""AMC's reason to exist: RL-searched per-layer channel ratios must beat
uniform pruning at EQUAL preserved FLOPs.

The reference's published tables separate "uniform" from "RL-based" columns
at every FLOPs point and the RL column wins (e.g. MobileNet-v1 @50% FLOPs:
66.5 uniform vs 67.8 RL, /root/reference/docs/docs/performance.md:9-14).
This experiment reproduces that comparison on the calibrated MobileNet-v1
parity-hard strip (96x96, depth_mult 0.5, snr 0.15 -> ~0.89 baseline,
experiments/synthetic_parity.py MOBILENET_SNR):

1. train the full-prec baseline;
2. run a REAL DDPG search (>=50 roll-outs, exploitation enabled) with the
   LASSO channel pruner in auto mode, then finetune the best ratio vector;
3. prune UNIFORMLY at the same preserved-FLOPs fraction from the SAME
   baseline checkpoint and finetune identically;
4. lock `rl >= uniform - noise` as a band (tests/test_amc_band.py).

Run on the chip:  python experiments/amc_vs_uniform.py --publish
Smoke:            python experiments/amc_vs_uniform.py --rlouts 4 --quick
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

import numpy as np

import pocketflow_tpu  # noqa: F401
from pocketflow_tpu.config import FLAGS

# measured on-chip evidence bands (see experiments/results/amc_vs_uniform.json)
NOISE = 0.02  # run-to-run eval noise at 2048 eval samples

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'results', 'amc_vs_uniform.json')


def check_results(results):
    """The locked claim: RL >= uniform - noise at equal preserved FLOPs."""
    violations = []
    for key in ('rl_accuracy', 'uniform_accuracy', 'preserved_flops_frac'):
        if key not in results:
            violations.append('%s missing from results' % key)
    if violations:
        return violations
    if results['rl_accuracy'] < results['uniform_accuracy'] - NOISE:
        violations.append(
            'RL-searched ratios (%.4f) lost to uniform (%.4f) by more than '
            'the noise band %.2f' % (results['rl_accuracy'],
                                     results['uniform_accuracy'], NOISE))
    if not 0.3 <= results['preserved_flops_frac'] <= 0.55:
        violations.append('preserved FLOPs %.3f is not a ~50%% operating '
                          'point' % results['preserved_flops_frac'])
    return violations


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rlouts', type=int, default=60)
    ap.add_argument('--rlouts_min', type=int, default=15)
    ap.add_argument('--quick', action='store_true')
    ap.add_argument('--publish', action='store_true')
    ap.add_argument('--check-file', dest='check_file', default=None)
    args = ap.parse_args()

    if args.check_file:
        with open(args.check_file) as fin:
            violations = check_results(json.load(fin))
        if violations:
            print('AMC-vs-uniform BAND VIOLATIONS:')
            for v in violations:
                print('  ' + v)
            sys.exit(1)
        print('amc-vs-uniform band: RL beats uniform at equal FLOPs')
        return

    import jax
    from pocketflow_tpu.learners import create_learner
    from pocketflow_tpu.nets.mobilenet_at_ilsvrc12 import ModelHelper

    workdir = tempfile.mkdtemp(prefix='pf_amc_vs_uniform_')
    results = {'_quick': bool(args.quick)}

    FLAGS.override(
        # the calibrated MobileNet-v1 parity-hard regime
        # (experiments/synthetic_parity.py run_sweep_mobilenet)
        synthetic_data=True, synthetic_task='hard', synthetic_snr=0.15,
        nb_classes=64, compute_dtype='bfloat16', rand_seed=0,
        batch_size=128, batch_size_eval=128, ilsvrc_image_size=96,
        mobilenet_depth_mult=0.5, mobilenet_version=1,
        nb_smpls_train=16384, nb_smpls_eval=2048,
        lrn_rate_init=0.1, summ_step=400, save_step=10 ** 6,
        save_path=os.path.join(workdir, 'models/model.ckpt'),
        log_dir=os.path.join(workdir, 'logs'),
        nb_epochs_rat=0.05 if args.quick else 0.2)

    # 1. baseline
    learner = create_learner(None, ModelHelper(), learner_name='full-prec')
    state = learner.train()
    baseline = float(learner.run_eval_loop(
        state, learner.build_eval_step())['accuracy'])
    results['baseline_accuracy'] = round(baseline, 4)
    print(json.dumps({'baseline_accuracy': results['baseline_accuracy']}),
          flush=True)

    # 2. RL search + finetune (ChannelPrunedLearner auto mode end-to-end)
    rewards = []
    t0 = time.time()
    with FLAGS.scope(cp_prune_option='auto', cp_preserve_ratio=0.5,
                     cp_nb_rlouts=args.rlouts,
                     cp_nb_rlouts_min=args.rlouts_min,
                     cp_nb_batches=6, cp_nb_points_per_layer=8,
                     cp_nb_iters_ft_ratio=1.0,
                     cp_best_path=os.path.join(workdir, 'rl/best_model.ckpt'),
                     cp_channel_pruned_path=os.path.join(
                         workdir, 'rl/model.ckpt')):
        rl_learner = create_learner(None, ModelHelper(),
                                    learner_name='channel')
        orig_info = rl_learner.log.info

        def tee_info(msg, *a):
            if msg.startswith('rlout #'):
                rewards.append(round(float(a[1]), 4))
            orig_info(msg, *a)
        rl_learner.log.info = tee_info
        rl_state = rl_learner.train()
        rl_acc = float(rl_learner.run_eval_loop(
            rl_state, rl_learner.build_eval_step())['accuracy'])
        # the searched ratio vector + its true preserved-FLOPs fraction
        search = np.load(os.path.join(workdir, 'rl/ddpg_search.npz'),
                         allow_pickle=True)
        ratios = [float(r) for r in search['x_ratios_best']]
        flops = np.array([s['flops'] for s in rl_learner.specs], np.float64)
        preserved = float(np.sum(flops * np.asarray(ratios)) / flops.sum())
    results.update({
        'rl_accuracy': round(rl_acc, 4),
        'rl_ratios': [round(r, 3) for r in ratios],
        'preserved_flops_frac': round(preserved, 4),
        'nb_rlouts': args.rlouts, 'nb_rlouts_min': args.rlouts_min,
        'reward_trace': rewards,
        'search_wall_s': round(time.time() - t0, 1),
    })
    print(json.dumps({'rl_accuracy': results['rl_accuracy'],
                      'preserved_flops_frac': preserved}), flush=True)

    # 3. uniform at the SAME preserved-FLOPs fraction, same baseline ckpt,
    # identical finetune budget
    with FLAGS.scope(cp_prune_option='uniform',
                     cp_uniform_preserve_ratio=preserved,
                     cp_nb_batches=6, cp_nb_points_per_layer=8,
                     cp_nb_iters_ft_ratio=1.0,
                     cp_channel_pruned_path=os.path.join(
                         workdir, 'uni/model.ckpt')):
        uni_learner = create_learner(None, ModelHelper(),
                                     learner_name='channel')
        uni_state = uni_learner.train()
        uni_acc = float(uni_learner.run_eval_loop(
            uni_state, uni_learner.build_eval_step())['accuracy'])
    results['uniform_accuracy'] = round(uni_acc, 4)
    print(json.dumps({'uniform_accuracy': results['uniform_accuracy']}),
          flush=True)

    results['device'] = str(jax.devices()[0])
    print(json.dumps(results, indent=1))

    if args.publish and not args.quick:
        out = RESULTS
    else:
        if args.publish:
            print('NOTE: --publish ignored under --quick')
        out = os.path.join(os.environ.get('PF_PARITY_OUT',
                                          '/tmp/pf_parity_results'),
                           'amc_vs_uniform.json')
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, 'w') as fout:
        json.dump(results, fout, indent=1)
    print('results written to %s' % out)

    violations = check_results(results)
    if violations and not args.quick:
        print('AMC-vs-uniform BAND VIOLATIONS:')
        for v in violations:
            print('  ' + v)
        sys.exit(1)


if __name__ == '__main__':
    main()
