"""Calibrate the hard parity task: find the SNR where the full-precision
baseline lands ~0.75-0.90 held-out accuracy (non-saturating, so the
parity sweeps in synthetic_parity.py have discriminating power).

Families: resnet20 (CIFAR-sized, 32x32) and mobilenet_v1 (the reference's
headline compression family, 224x224 — matched-filter difficulty scales with
sqrt(pixels), so its calibrated SNR is ~7x lower).

    python experiments/parity_calibrate.py [--snr 0.06,0.08,0.10]
    python experiments/parity_calibrate.py --family mobilenet_v1 --snr 0.02,0.03
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pocketflow_tpu  # noqa: F401
from pocketflow_tpu.config import FLAGS


def run_one(snr, seed=0, epochs_rat=0.2, family='resnet20'):
    workdir = tempfile.mkdtemp(prefix='pf_cal_')
    from pocketflow_tpu.learners import create_learner
    if family == 'mobilenet_v1':
        from pocketflow_tpu.nets.mobilenet_at_ilsvrc12 import ModelHelper
        FLAGS.override(
            synthetic_data=True, synthetic_task='hard', synthetic_snr=snr,
            nb_classes=64, compute_dtype='bfloat16', rand_seed=seed,
            batch_size=128, batch_size_eval=128,
            # 96x96 keeps the strip off the 13 MB/s host->device tunnel
            # bottleneck (224x224 runs at ~200 img/s, 96x96 at ~1000)
            ilsvrc_image_size=96,
            # depth_mult 0.5 + 16k samples: the full 4.2M-param net memorizes
            # an 8k-sample set instantly and never generalizes (measured eval
            # 0.065-0.165 across snr 0.02-0.30 with train top-1 at 1.0);
            # halving the width and doubling the data restores the
            # params:samples regime the ResNet-20 harness calibrated at,
            # while keeping the depthwise-separable compression behavior
            # the family exists to cover
            mobilenet_depth_mult=0.5,
            nb_smpls_train=16384, nb_smpls_eval=2048,
            lrn_rate_init=0.1, summ_step=200, save_step=10**6,
            save_path=os.path.join(workdir, 'models/model.ckpt'),
            log_dir=os.path.join(workdir, 'logs'),
            mobilenet_version=1, nb_epochs_rat=epochs_rat)
        helper = ModelHelper()
    else:
        from pocketflow_tpu.nets.resnet_at_cifar10 import ModelHelper
        FLAGS.override(
            synthetic_data=True, synthetic_task='hard', synthetic_snr=snr,
            nb_classes=64, compute_dtype='bfloat16', rand_seed=seed,
            batch_size=128, batch_size_eval=128, nb_smpls_train=4096,
            nb_smpls_eval=2048, lrn_rate_init=0.1, summ_step=200,
            save_step=10**6,
            save_path=os.path.join(workdir, 'models/model.ckpt'),
            log_dir=os.path.join(workdir, 'logs'),
            resnet_size=20, nb_epochs_rat=epochs_rat)
        helper = ModelHelper()
    learner = create_learner(None, helper, learner_name='full-prec')
    state = learner.train()
    return float(learner.run_eval_loop(state, learner.build_eval_step())['accuracy'])


def main():
    snrs, family, epochs_rat = [0.06, 0.08, 0.10], 'resnet20', None
    args = sys.argv[1:]
    for i, arg in enumerate(args):
        if arg.startswith('--snr'):
            # both '--snr=a,b' and '--snr a,b' forms (docstring documents
            # the space-separated one)
            raw = arg.split('=', 1)[1] if '=' in arg else args[i + 1]
            snrs = [float(v) for v in raw.split(',')]
        elif arg.startswith('--family'):
            family = arg.split('=', 1)[1] if '=' in arg else args[i + 1]
        elif arg.startswith('--epochs_rat'):
            epochs_rat = float(arg.split('=', 1)[1] if '=' in arg
                               else args[i + 1])
    if epochs_rat is None:
        epochs_rat = 0.15 if family == 'mobilenet_v1' else 0.2
    results = {}
    for snr in snrs:
        acc = run_one(snr, family=family, epochs_rat=epochs_rat)
        results['snr=%.3f' % snr] = round(acc, 4)
        print(json.dumps(results))


if __name__ == '__main__':
    main()
