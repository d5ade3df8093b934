"""Shared trace-capture policy for layerwise-regression learners.

Several learners need "the outputs of every conv/dense in the full network"
as regression targets (weight sparsification pr_optimizer.py:283-314, channel
pruning channel_pruner.py:263-341, channel_pruning_gpu learner.py:356-402,
channel_pruning_rmt learner.py:432-523 in /root/reference).  The reference
gets them by pattern-matching ops in the frozen TF graph; here a
`CompressionPolicy` records them during a forward trace, and optionally cuts
gradients at every layer *input* so a single summed L2 loss yields each
layer's independent regression gradient (joint layerwise regression — one
fused XLA program instead of per-layer session loops).
"""

from __future__ import annotations

from typing import List, Tuple

import jax

from pocketflow_tpu.nn.layers import CompressionPolicy, compression


class CapturePolicy(CompressionPolicy):
    """Records conv/dense outputs during a forward trace; optionally cuts
    gradients at every layer input (joint layerwise regression)."""

    def __init__(self, stop_input_grads: bool = False,
                 inner: CompressionPolicy = None):
        self.stop_input_grads = stop_input_grads
        self.inner = inner  # compose with a compression policy (e.g. masks)
        self.captured: List[Tuple[str, jax.Array]] = []

    def reset_trace(self):
        super().reset_trace()
        if self.inner is not None:
            self.inner.reset_trace()
        self.captured = []

    def process_weight(self, path, kernel):
        if self.inner is not None:
            kernel = self.inner.process_weight(path, kernel)
        return kernel

    def process_act(self, path: str, act: jax.Array) -> jax.Array:
        if self.inner is not None:
            act = self.inner.process_act(path, act)
        if not path.startswith('act/'):  # module-path sites = conv/dense outputs
            self.captured.append((path, act))
        return act

    def process_input(self, path: str, x: jax.Array) -> jax.Array:
        if self.inner is not None:
            x = self.inner.process_input(path, x)
        return jax.lax.stop_gradient(x) if self.stop_input_grads else x


def capture_forward(model, variables, images, stop_input_grads=False,
                    inner=None, train=False):
    """Run a forward trace and return [(path, activation)] for every
    conv/dense output (in graph order)."""
    policy = CapturePolicy(stop_input_grads=stop_input_grads, inner=inner)
    with compression(policy):
        model.apply(variables, images, train=train,
                    **({'mutable': ['batch_stats']} if train else {}))
    return policy.captured


def capture_forward_with_output(model, variables, images,
                                stop_input_grads=False, inner=None,
                                train=False):
    """Like capture_forward, but also returns the model output — callers
    needing both (e.g. DCP's final-loss term) get them from ONE forward."""
    policy = CapturePolicy(stop_input_grads=stop_input_grads, inner=inner)
    with compression(policy):
        out = model.apply(variables, images, train=train,
                          **({'mutable': ['batch_stats']} if train else {}))
    if train:
        out = out[0]
    return policy.captured, out


def regression_paths_filter(model_name: str, path: str) -> bool:
    """Which core-op outputs are regression targets (WS pr_optimizer.py:292-296):
    mobilenets regress only pointwise + final 1x1 convs; others all convs/fcs."""
    if model_name.startswith('mobilenet'):
        return ('pw' in path) or ('logits' in path) or ('fc' in path)
    return True
