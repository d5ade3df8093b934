"""MobileNet v1/v2 shape/compression-hook tests."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from pocketflow_tpu.config import FLAGS


def test_mobilenet_v1_forward_shapes():
    from pocketflow_tpu.nets.mobilenet import MobileNetV1
    model = MobileNetV1(nb_classes=10, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 10) and out.dtype == jnp.float32


@pytest.mark.slow
def test_mobilenet_v2_forward_and_residuals():
    from pocketflow_tpu.nets.mobilenet import MobileNetV2
    model = MobileNetV2(nb_classes=10, dtype=jnp.float32)
    x = jnp.ones((2, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 10)
    assert np.all(np.isfinite(np.asarray(out)))


def test_depth_multiplier_rounds_to_8():
    from pocketflow_tpu.nets.mobilenet import _depth
    assert _depth(64, 1.0) == 64
    assert _depth(64, 0.5) == 32
    assert _depth(64, 0.75) == 48
    assert _depth(32, 0.25) == 8
    assert _depth(16, 0.25) == 8  # min_depth


def test_mobilenet_quant_site_discovery():
    """WS regression targets must match pointwise convs + classifier."""
    from pocketflow_tpu.learners.uniform_quantization import utils as uq_utils
    from pocketflow_tpu.learners.weight_sparsification.pr_optimizer import (
        regression_paths_filter)
    from pocketflow_tpu.nets.mobilenet import MobileNetV1
    model = MobileNetV1(nb_classes=10, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    with FLAGS.scope(uql_quantize_all_layers=True):
        stats = uq_utils.discover_quant_sites(model, dict(variables), x)
    # 1 stem + 13 dw + 13 pw + logits = 28 matmul/conv sites
    assert stats['nb_matmuls'] == 28
    pw_sites = [p for p in stats['weight_paths']
                if regression_paths_filter('mobilenet_v1', p)]
    assert len(pw_sites) == 14  # 13 pointwise + logits
