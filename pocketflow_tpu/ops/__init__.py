"""Hot compute ops: Pallas TPU kernels + pure-XLA fallbacks."""
