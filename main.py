"""PocketFlow-TPU entry point.

Rebuild of the reference's L6 entry layer (/root/reference/nets/*_run.py +
scripts/run_local.sh:38-48): the reference copies `<net>_run.py` to main.py
and launches it under mpirun; here one dispatcher selects the model helper by
``--model`` (or positional name) and runs the learner chosen by ``--learner``.
Multi-chip data parallelism needs no mpirun — the mesh spans every
addressable chip (jax.distributed under a multi-host launcher).

Usage:
    python main.py --model=resnet_at_cifar10 --learner=weight-sparse \
        --data_dir_local=/data/cifar10 [--exec_mode=train|eval] [flags...]
"""

import importlib
import sys

MODELS = {
    'convnet_at_fmnist': 'pocketflow_tpu.nets.convnet_at_fmnist',
    'lenet_at_cifar10': 'pocketflow_tpu.nets.lenet_at_cifar10',
    'resnet_at_cifar10': 'pocketflow_tpu.nets.resnet_at_cifar10',
    'resnet_at_ilsvrc12': 'pocketflow_tpu.nets.resnet_at_ilsvrc12',
    'mobilenet_at_ilsvrc12': 'pocketflow_tpu.nets.mobilenet_at_ilsvrc12',
    'vgg_at_pascalvoc': 'pocketflow_tpu.nets.vgg_at_pascalvoc',
    'faster_rcnn_at_pascalvoc': 'pocketflow_tpu.nets.faster_rcnn_at_pascalvoc',
}


def main(argv=None):
    import os
    if os.environ.get('JAX_PLATFORMS'):
        # honor the env var even when a sitecustomize pre-imported jax with
        # another platform baked in (JAX_PLATFORMS=cpu for local multi-host
        # smoke runs via scripts/run_multihost.sh)
        import jax
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
    import pocketflow_tpu  # registers the full flag surface
    from pocketflow_tpu.config import FLAGS
    from pocketflow_tpu.core.metrics import SummaryWriter, get_logger
    from pocketflow_tpu.learners import create_learner
    from pocketflow_tpu.utils.path_args import apply_path_conf

    FLAGS.DEFINE_string('model', 'convnet_at_fmnist',
                        'model helper: ' + ' | '.join(sorted(MODELS)))
    leftovers = FLAGS.parse_args(argv)
    model_name = FLAGS.model
    for arg in leftovers:  # allow a bare positional model name
        if arg in MODELS:
            model_name = arg
        elif arg.startswith('-'):
            # the reference's tf.app.flags errors on unknown flags; a typo'd
            # flag silently training with defaults is worse than exiting
            raise SystemExit('unrecognized flag %r (see --help)' % arg)
    apply_path_conf(model_name)

    log = get_logger()
    log.info('model = %s | learner = %s | exec_mode = %s',
             model_name, FLAGS.learner, FLAGS.exec_mode)
    module = importlib.import_module(MODELS[model_name])
    sm_writer = SummaryWriter(FLAGS.log_dir)
    learner = create_learner(sm_writer, module.ModelHelper())
    if FLAGS.exec_mode == 'train':
        learner.train()
    elif FLAGS.exec_mode == 'eval':
        learner.evaluate()
    else:
        raise ValueError('unrecognized execution mode: ' + FLAGS.exec_mode)
    sm_writer.close()


if __name__ == '__main__':
    main(sys.argv[1:])
