from pocketflow_tpu.learners.weight_sparsification.learner import WeightSparseLearner

__all__ = ['WeightSparseLearner']
