"""Learners: the compression algorithms (weight sparsification, quantization,
channel pruning, full-precision baseline) as pure pytree transformations."""

from pocketflow_tpu.learners.learner_utils import create_learner  # noqa: F401


def register_all_flags():
    """Import every learner's flag-bearing modules so the full reference flag
    surface (ws_*, uql_*, nuql_*, cpg_*, ...) is registered before CLI parse
    — the reference registers them at entry-script import time
    (/root/reference/learners/*/learner.py module-level DEFINEs)."""
    import pocketflow_tpu.learners.weight_sparsification.pr_optimizer  # noqa: F401
    import pocketflow_tpu.learners.uniform_quantization.utils  # noqa: F401
    import pocketflow_tpu.learners.uniform_quantization.bit_optimizer  # noqa: F401
    import pocketflow_tpu.learners.nonuniform_quantization.utils  # noqa: F401
    import pocketflow_tpu.learners.channel_pruning_gpu.learner  # noqa: F401
    for optional in ('channel_pruning.learner', 'channel_pruning_rmt.learner',
                     'discr_channel_pruning.learner',
                     'uniform_quantization_tf.learner'):
        try:
            __import__('pocketflow_tpu.learners.' + optional)
        except ImportError:
            pass  # subsystem not built yet
    # net-helper flags (resnet_size, mobilenet_version, ssd_*, frcnn_*, ...)
    for net in ('resnet_at_ilsvrc12', 'resnet_at_cifar10',
                'mobilenet_at_ilsvrc12', 'vgg_at_pascalvoc',
                'faster_rcnn_at_pascalvoc'):
        try:
            __import__('pocketflow_tpu.nets.' + net)
        except ImportError:
            pass
