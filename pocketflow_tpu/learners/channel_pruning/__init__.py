from pocketflow_tpu.learners.channel_pruning.learner import ChannelPrunedLearner

__all__ = ['ChannelPrunedLearner']
