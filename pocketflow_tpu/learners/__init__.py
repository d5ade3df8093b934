"""Learners: the compression algorithms (weight sparsification, quantization,
channel pruning, full-precision baseline) as pure pytree transformations."""

from pocketflow_tpu.learners.learner_utils import create_learner  # noqa: F401
