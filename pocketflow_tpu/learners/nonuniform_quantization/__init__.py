from pocketflow_tpu.learners.nonuniform_quantization.learner import NonUniformQuantLearner

__all__ = ['NonUniformQuantLearner']
