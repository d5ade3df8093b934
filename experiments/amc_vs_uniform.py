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
   LASSO channel pruner in auto mode;
3. fully finetune the TOP-K distinct candidate ratio vectors (by fast-eval
   reward) and select the winner by VAL accuracy — the fast reward is a
   <=12-batch estimate whose argmax suffers winner's curse, so re-ranking K
   finetuned candidates on the val split removes that selection noise
   without ever touching the test set (the test accuracy is read once, from
   the winner only);
4. prune UNIFORMLY at the winner's preserved-FLOPs fraction from the SAME
   baseline checkpoint and finetune identically (one arm, one finetune —
   the uniform column needs no candidate selection because it has no
   search);
5. lock `rl >= uniform - noise` as a band (tests/test_amc_band.py).

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
    ap.add_argument('--topk', type=int, default=3,
                    help='fully finetune the K best distinct candidates and '
                         'select by VAL accuracy (1 = trust the reward argmax)')
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

    # 2. RL search, then full finetune of the top-K distinct candidates
    # with winner selection by VAL accuracy (the manual decomposition of
    # ChannelPrunedLearner.train(): search_ratios_rl + prune_and_finetune)
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

        rl_learner.require_dp_only('the LASSO prune/search phase')
        state0, _, _ = rl_learner.init_state()
        state0, _ = rl_learner.restore_baseline(state0)
        rl_learner._setup_pruner(state0)
        best_ratios = rl_learner.search_ratios_rl(state0)
        candidates = rl_learner.search_topk[:max(1, args.topk)]
        if not candidates:
            candidates = [(float('nan'), best_ratios)]
        search_wall = time.time() - t0

        # selection on the held-out VAL split only (never the test set)
        eval_step = rl_learner.build_eval_step()
        _, val_iter = rl_learner.dataset_train.build(enbl_trn_val_split=True)
        nb_val = max(1, min(12, rl_learner.dataset_train.spec.nb_smpls_val
                            // rl_learner.dataset_train.batch_size))
        cand_rows, best_val, rl_state, ratios = [], -np.inf, None, None
        for ci, (rwd, cand) in enumerate(candidates):
            with FLAGS.scope(cp_channel_pruned_path=os.path.join(
                    workdir, 'rl/cand%d/model.ckpt' % ci)):
                st, _, _ = rl_learner.init_state()
                st, _ = rl_learner.restore_baseline(st)
                st = rl_learner.prune_and_finetune(st, cand)
            val_acc = float(np.mean([float(jax.device_get(eval_step(
                st, rl_learner.put_batch(next(val_iter)))['accuracy']))
                for _ in range(nb_val)]))
            cand_rows.append({'reward': round(float(rwd), 4),
                              'val_accuracy': round(val_acc, 4),
                              'ratios': [round(float(r), 3) for r in cand]})
            print(json.dumps({'candidate': ci, **cand_rows[-1]}), flush=True)
            if val_acc > best_val:
                best_val, rl_state, ratios = val_acc, st, list(cand)
        # the test set is read ONCE, for the winner
        rl_acc = float(rl_learner.run_eval_loop(
            rl_state, eval_step)['accuracy'])
        flops = np.array([s['flops'] for s in rl_learner.specs], np.float64)
        preserved = float(np.sum(flops * np.asarray(ratios)) / flops.sum())
    results.update({
        'rl_accuracy': round(rl_acc, 4),
        'rl_ratios': [round(r, 3) for r in ratios],
        'preserved_flops_frac': round(preserved, 4),
        'nb_rlouts': args.rlouts, 'nb_rlouts_min': args.rlouts_min,
        'topk': len(candidates),
        'rl_selection': 'full-finetune top-k, winner by val accuracy',
        'candidates': cand_rows,
        'reward_trace': rewards,
        'search_wall_s': round(search_wall, 1),
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
