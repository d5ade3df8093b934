from pocketflow_tpu.learners.channel_pruning_rmt.learner import ChannelPrunedRmtLearner

__all__ = ['ChannelPrunedRmtLearner']
