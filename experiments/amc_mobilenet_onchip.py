"""On-chip AMC PLUMBING drill: MobileNet-v1, DDPG channel-ratio search.

This drill proves the search MACHINERY end-to-end on the real chip — DDPG
actor/critic updates, per-layer LASSO selection + reconstruction inside
every roll-out, rewards from the train/val split, FLOPs budget constraint,
atomic search checkpoint written each roll-out (kill-mid-search resume is
exercised by tests/test_search_hygiene.py).  It is NOT the search-QUALITY
evidence: at 224x224 the warm-train budget that fits a drill leaves the
baseline at ~0.35 accuracy, so rewards barely vary.  Search quality (RL
beating uniform at equal preserved FLOPs, the reference's
docs/performance.md:9-14 claim) is measured by
``experiments/amc_vs_uniform.py`` in the calibrated 96x96 regime and locked
by tests/test_amc_band.py.

Writes the roll-out reward trace + best ratios to
``experiments/results/amc_mobilenet_r3.json``.

    python experiments/amc_mobilenet_onchip.py                # ~12 roll-outs
    python experiments/amc_mobilenet_onchip.py --rlouts 4     # smoke
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import pocketflow_tpu  # noqa: F401
from pocketflow_tpu.config import FLAGS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rlouts', type=int, default=12)
    ap.add_argument('--warm_steps', type=int, default=600)
    ap.add_argument('--out', default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'results',
        'amc_mobilenet_r3.json'))
    args = ap.parse_args()

    import jax
    from pocketflow_tpu.learners.channel_pruning import ChannelPrunedLearner
    from pocketflow_tpu.nets.mobilenet_at_ilsvrc12 import ModelHelper

    tmp = tempfile.mkdtemp(prefix='amc_r3_')
    rewards, ratio_log = [], []

    with FLAGS.scope(batch_size=32, batch_size_eval=32, nb_classes=16,
                     nb_smpls_train=2048, nb_smpls_val=256, nb_smpls_eval=256,
                     nb_epochs_rat=0.15, lrn_rate_init=0.05,
                     mobilenet_version=1,
                     cp_prune_option='auto', cp_preserve_ratio=0.5,
                     cp_nb_rlouts=args.rlouts,
                     cp_nb_rlouts_min=max(2, args.rlouts // 4),
                     cp_nb_batches=2, cp_nb_points_per_layer=4,
                     cp_best_path=os.path.join(tmp, 'best_model.ckpt')):
        learner = ChannelPrunedLearner(None, ModelHelper())
        state, tx, _ = learner.init_state()

        # warm-train so pruning damage is measurable in the reward
        step = learner.build_train_step(tx)
        train_it = learner.dataset_train.build()
        import jax.random as jrandom
        rng = jrandom.PRNGKey(0)
        for i in range(args.warm_steps):
            state, m = step(state, learner.put_batch(next(train_it)),
                            jrandom.fold_in(rng, i))
        eval_step = learner.build_eval_step()
        accs = [float(jax.device_get(eval_step(
            state, learner.put_batch(next(train_it)))['accuracy']))
            for _ in range(4)]
        base_acc = float(np.mean(accs))
        print('warm-trained baseline accuracy (train batches): %.3f' % base_acc,
              flush=True)

        learner._setup_pruner(state)

        # tap the per-rollout log line's data directly
        orig_info = learner.log.info

        def tee_info(msg, *a):
            if msg.startswith('rlout #'):
                rewards.append(float(a[1]))
                ratio_log.append(list(a[4]))
            orig_info(msg, *a)
        learner.log.info = tee_info

        import time
        t0 = time.time()
        ratios = learner.search_ratios_rl(state)
        wall = time.time() - t0

        flops = np.array([s['flops'] for s in learner.specs], np.float64)
        preserved = float(np.sum(flops * np.asarray(ratios)) / flops.sum())
        assert preserved <= FLAGS.cp_preserve_ratio + 1e-6, preserved
        ckpt = os.path.join(tmp, 'ddpg_search.npz')
        assert os.path.exists(ckpt), 'search checkpoint missing'

        result = {
            'date': '2026-08-17', 'device': str(jax.devices()[0]),
            'model': 'mobilenet_v1', 'image_size': 224,
            'nb_rlouts': args.rlouts, 'nb_prunable_convs': len(learner.specs),
            'warm_steps': args.warm_steps,
            'baseline_accuracy': round(base_acc, 4),
            'wall_s': round(wall, 1),
            'preserved_flops_frac': round(preserved, 4),
            'reward_trace': [round(r, 4) for r in rewards],
            'best_reward': round(max(rewards), 4) if rewards else None,
            'best_ratios': [round(float(r), 3) for r in ratios],
        }

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
