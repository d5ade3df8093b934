"""Learner factory (rebuild of /root/reference/learners/learner_utils.py:33-66).

Maps the --learner flag to a learner class:
  full-prec | weight-sparse | uniform | uniform-tf | non-uniform |
  channel | chn-pruned-gpu | chn-pruned-rmt | dis-chn-pruned
"""

from __future__ import annotations


def create_learner(sm_writer, model_helper, learner_name=None):
    """Create the learner specified by `learner_name` (default: FLAGS.learner)."""
    from pocketflow_tpu.config import FLAGS
    name = learner_name or FLAGS.learner

    if name == 'full-prec':
        from pocketflow_tpu.learners.full_precision import FullPrecLearner
        return FullPrecLearner(sm_writer, model_helper)
    if name == 'weight-sparse':
        from pocketflow_tpu.learners.weight_sparsification.learner import WeightSparseLearner
        return WeightSparseLearner(sm_writer, model_helper)
    if name == 'uniform':
        from pocketflow_tpu.learners.uniform_quantization.learner import UniformQuantLearner
        return UniformQuantLearner(sm_writer, model_helper)
    if name == 'uniform-tf':
        from pocketflow_tpu.learners.uniform_quantization_tf import UniformQuantTFLearner
        return UniformQuantTFLearner(sm_writer, model_helper)
    if name == 'non-uniform':
        from pocketflow_tpu.learners.nonuniform_quantization.learner import NonUniformQuantLearner
        return NonUniformQuantLearner(sm_writer, model_helper)
    if name == 'channel':
        from pocketflow_tpu.learners.channel_pruning.learner import ChannelPrunedLearner
        return ChannelPrunedLearner(sm_writer, model_helper)
    if name == 'chn-pruned-gpu':
        from pocketflow_tpu.learners.channel_pruning_gpu import ChannelPrunedGpuLearner
        return ChannelPrunedGpuLearner(sm_writer, model_helper)
    if name == 'chn-pruned-rmt':
        from pocketflow_tpu.learners.channel_pruning_rmt import ChannelPrunedRmtLearner
        return ChannelPrunedRmtLearner(sm_writer, model_helper)
    if name == 'dis-chn-pruned':
        from pocketflow_tpu.learners.discr_channel_pruning import DisChnPrunedLearner
        return DisChnPrunedLearner(sm_writer, model_helper)
    raise ValueError('unrecognized learner name: ' + name)
