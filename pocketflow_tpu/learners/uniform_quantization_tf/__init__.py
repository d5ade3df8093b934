from pocketflow_tpu.learners.uniform_quantization_tf.learner import UniformQuantTFLearner

__all__ = ['UniformQuantTFLearner']
