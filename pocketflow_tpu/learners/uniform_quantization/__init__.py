from pocketflow_tpu.learners.uniform_quantization.learner import UniformQuantLearner

__all__ = ['UniformQuantLearner']
