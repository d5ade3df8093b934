from pocketflow_tpu.learners.channel_pruning_gpu.learner import ChannelPrunedGpuLearner

__all__ = ['ChannelPrunedGpuLearner']
