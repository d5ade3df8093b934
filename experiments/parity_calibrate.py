"""Calibrate the hard parity task: find the SNR where the full-precision
ResNet-20 baseline lands ~0.75-0.90 held-out accuracy (non-saturating, so the
9-learner parity sweep in synthetic_parity.py has discriminating power).

    python experiments/parity_calibrate.py [--snr 0.06,0.08,0.10]
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pocketflow_tpu  # noqa: F401
from pocketflow_tpu.config import FLAGS


def run_one(snr, seed=0, epochs_rat=0.2):
    workdir = tempfile.mkdtemp(prefix='pf_cal_')
    FLAGS.override(
        synthetic_data=True, synthetic_task='hard', synthetic_snr=snr,
        nb_classes=64, compute_dtype='bfloat16', rand_seed=seed,
        batch_size=128, batch_size_eval=128, nb_smpls_train=4096,
        nb_smpls_eval=2048, lrn_rate_init=0.1, summ_step=200, save_step=10**6,
        save_path=os.path.join(workdir, 'models/model.ckpt'),
        log_dir=os.path.join(workdir, 'logs'),
        resnet_size=20, nb_epochs_rat=epochs_rat)
    from pocketflow_tpu.nets.resnet_at_cifar10 import ModelHelper
    from pocketflow_tpu.learners import create_learner
    learner = create_learner(None, ModelHelper(), learner_name='full-prec')
    state = learner.train()
    return float(learner.run_eval_loop(state, learner.build_eval_step())['accuracy'])


def main():
    snrs = [0.06, 0.08, 0.10]
    args = sys.argv[1:]
    for i, arg in enumerate(args):
        if arg.startswith('--snr'):
            # both '--snr=a,b' and '--snr a,b' forms (docstring documents
            # the space-separated one)
            raw = arg.split('=', 1)[1] if '=' in arg else args[i + 1]
            snrs = [float(v) for v in raw.split(',')]
    results = {}
    for snr in snrs:
        acc = run_one(snr)
        results['snr=%.3f' % snr] = round(acc, 4)
        print(json.dumps(results))


if __name__ == '__main__':
    main()
