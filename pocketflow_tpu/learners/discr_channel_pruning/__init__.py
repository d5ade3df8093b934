from pocketflow_tpu.learners.discr_channel_pruning.learner import DisChnPrunedLearner

__all__ = ['DisChnPrunedLearner']
