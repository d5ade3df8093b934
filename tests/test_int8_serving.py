"""Int8 serving path: quantization accuracy + policy integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.nn.layers import compression
from pocketflow_tpu.ops import int8_ops


def test_symmetric_weight_quant_roundtrip():
    k = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 8, 16))
    codes, scale = int8_ops.quantize_weights_symmetric(k)
    assert codes.dtype == jnp.int8 and scale.shape == (16,)
    restored = np.asarray(codes, np.float32) * np.asarray(scale)
    err = np.abs(restored - np.asarray(k))
    # per-channel: error bounded by scale/2
    assert np.all(err.reshape(-1, 16).max(0) <= np.asarray(scale) * 0.5 + 1e-6)


def test_int8_serving_matches_float_forward():
    """Int8 forward must approximate the float forward closely."""
    from pocketflow_tpu.nets.convnet_at_fmnist import ConvNet
    model = ConvNet(nb_classes=10, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 28, 28, 1)) * 0.5
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    ref = np.asarray(model.apply(variables, x, train=False))

    act_scales = int8_ops.calibrate(model, variables, [x])
    assert len(act_scales) >= 4  # every conv/dense input calibrated
    weight_q = int8_ops.quantize_model_weights(variables['params'])
    policy = int8_ops.Int8ServingPolicy(weight_q, act_scales)
    with compression(policy):
        out = np.asarray(model.apply(variables, x, train=False))
    # int8 logits track float logits: same argmax on most samples + small error
    rel = np.abs(out - ref) / (np.abs(ref).max() + 1e-6)
    assert rel.max() < 0.1, rel.max()
    assert np.mean(np.argmax(out, -1) == np.argmax(ref, -1)) >= 0.75


def test_int8_policy_falls_through_without_scales():
    from pocketflow_tpu.nets.convnet_at_fmnist import ConvNet
    model = ConvNet(nb_classes=10, dtype=jnp.float32)
    x = jnp.ones((2, 28, 28, 1), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    ref = np.asarray(model.apply(variables, x, train=False))
    policy = int8_ops.Int8ServingPolicy({}, {})  # nothing quantized
    with compression(policy):
        out = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_quantized_latency_benchmark_runs():
    from pocketflow_tpu.nets.convnet_at_fmnist import ConvNet
    from pocketflow_tpu.tools.benchmark import calc_quantized_inference_time
    model = ConvNet(nb_classes=10, dtype=jnp.float32)
    x = jnp.zeros((2, 28, 28, 1), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    result = calc_quantized_inference_time(
        model, dict(variables), (2, 28, 28, 1),
        nb_calib_batches=1, nb_warmup=2, nb_timed=3)
    assert result['float']['latency_ms'] > 0
    assert result['int8']['latency_ms'] > 0
    assert result['speedup'] > 0


def test_quant_coverage_verification():
    """Every contraction site must be covered (the probe-loop analogue)."""
    from pocketflow_tpu.nets.mobilenet import MobileNetV1
    model = MobileNetV1(nb_classes=10, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    act_scales = int8_ops.calibrate(model, dict(variables), [x])
    weight_q = int8_ops.quantize_model_weights(variables['params'])
    report = int8_ops.verify_quant_coverage(
        model, dict(variables), x, weight_q, act_scales)
    assert report['unquantized_weights'] == []
    assert report['uncalibrated'] == []
    # dropping one layer's scales must be detected
    some = next(iter(weight_q))
    report = int8_ops.verify_quant_coverage(
        model, dict(variables), x, {k: v for k, v in weight_q.items() if k != some},
        act_scales)
    assert report['unquantized_weights'] == [some]


@pytest.mark.slow
def test_int8_depthwise_serving():
    """Depthwise convs also run int8 (MobileNet serving path)."""
    from pocketflow_tpu.nets.mobilenet import MobileNetV1
    model = MobileNetV1(nb_classes=10, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3)) * 0.3
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    ref = np.asarray(model.apply(variables, x, train=False))
    act_scales = int8_ops.calibrate(model, dict(variables), [x])
    weight_q = int8_ops.quantize_model_weights(variables['params'])
    assert any('/dw' in p or p.endswith('dw') for p in weight_q)
    policy = int8_ops.Int8ServingPolicy(weight_q, act_scales)
    with compression(policy):
        out = np.asarray(model.apply(variables, x, train=False))
    rel = np.abs(out - ref) / (np.abs(ref).max() + 1e-6)
    assert rel.max() < 0.35, rel.max()  # bf16-free int8 path stays close
