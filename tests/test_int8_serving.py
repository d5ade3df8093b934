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
    """MobileNet int8 serving: by default depthwise convs stay on the
    float path (they are VPU-bound — int8 around them is pure overhead,
    docs/performance.md int8 table), while skip_depthwise=False still
    runs them int8 end-to-end."""
    from pocketflow_tpu.nets.mobilenet import MobileNetV1
    model = MobileNetV1(nb_classes=10, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3)) * 0.3
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    # at init the running BN stats are (0, 1) and the eval forward decays to
    # ~1e-20 after 13 blocks, which makes any closeness assertion vacuous;
    # substitute the EXACT batch statistics of one train pass:
    # new = m*old + (1-m)*batch  =>  batch = (new - m*old) / (1-m)
    m = 0.997
    _, upd = model.apply(variables, x, train=True, mutable=['batch_stats'])
    batch_stats = jax.tree_util.tree_map(
        lambda o, n: (n - m * o) / (1.0 - m),
        dict(variables['batch_stats']), dict(upd['batch_stats']))
    variables = {'params': variables['params'], 'batch_stats': batch_stats}
    ref = np.asarray(model.apply(variables, x, train=False))
    assert np.abs(ref).max() > 1e-3  # non-degenerate forward
    act_scales = int8_ops.calibrate(model, dict(variables), [x])
    weight_q = int8_ops.quantize_model_weights(variables['params'])
    assert any('/dw' in p or p.endswith('dw') for p in weight_q)
    outs = {}
    for skip in (True, False):
        policy = int8_ops.Int8ServingPolicy(weight_q, act_scales,
                                            skip_depthwise=skip)
        with compression(policy):
            outs[skip] = np.asarray(model.apply(variables, x, train=False))
    # an untrained random net amplifies PTQ noise into the logits, so no
    # tight end-to-end band here (accuracy-level evidence lives in
    # docs/performance.md's serving table); assert structure instead:
    for skip, out in outs.items():
        assert np.isfinite(out).all(), skip
    # the two modes genuinely take different paths
    assert not np.allclose(outs[True], outs[False])
    # skipping the depthwise quantize/dequantize chains loses less precision
    err = {skip: float(np.abs(out - ref).max()) for skip, out in outs.items()}
    assert err[True] <= err[False], err


def test_depthwise_skip_is_bit_exact_float_path():
    """With skip_depthwise=True a lone depthwise conv under the int8 policy
    is BIT-IDENTICAL to the no-policy float path; with skip_depthwise=False
    it quantizes (differs)."""
    from pocketflow_tpu.nn.layers import PFDepthwiseConv
    model = PFDepthwiseConv(dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(model.apply(variables, x))
    weight_q = {'': int8_ops.quantize_weights_symmetric(
        variables['params']['kernel'])}
    act_scales = {'': float(np.abs(np.asarray(x)).max() / 127.0)}
    with compression(int8_ops.Int8ServingPolicy(weight_q, act_scales,
                                                skip_depthwise=True)):
        skipped = np.asarray(model.apply(variables, x))
    np.testing.assert_array_equal(skipped, ref)
    with compression(int8_ops.Int8ServingPolicy(weight_q, act_scales,
                                                skip_depthwise=False)):
        quantized = np.asarray(model.apply(variables, x))
    assert not np.array_equal(quantized, ref)
    np.testing.assert_allclose(quantized, ref,
                               atol=0.05 * float(np.abs(ref).max()))


def test_int8_policy_depthwise_signature():
    """The trace-time depthwise detector: grouped HWIO kernel (I==1,
    O==input channels) is skipped; a regular conv and a 1-channel-input
    conv are not."""
    weight_q = {'dw': (jnp.zeros((3, 3, 1, 16), jnp.int8), jnp.ones(16)),
                'conv': (jnp.zeros((3, 3, 16, 32), jnp.int8), jnp.ones(32)),
                'gray': (jnp.zeros((5, 5, 1, 32), jnp.int8), jnp.ones(32))}
    scales = {'dw': 0.1, 'conv': 0.1, 'gray': 0.1}
    policy = int8_ops.Int8ServingPolicy(weight_q, scales)
    calls = []
    fn = lambda xv, kv, acc_dtype=None: (calls.append(True),
                                         jnp.zeros((1, 1, 1, kv.shape[-1]),
                                                   jnp.int32))[1]
    assert policy.run_contraction(
        'dw', jnp.zeros((1, 8, 8, 16)), jnp.zeros((3, 3, 1, 16)), fn) is None
    assert policy.run_contraction(
        'conv', jnp.zeros((1, 8, 8, 16)), jnp.zeros((3, 3, 16, 32)),
        fn) is not None
    assert policy.run_contraction(
        'gray', jnp.zeros((1, 8, 8, 1)), jnp.zeros((5, 5, 1, 32)),
        fn) is not None


def test_int8_policy_depthwise_multiplier_gt1_is_skipped():
    """ADVICE r4 #5: depthwise with channel multiplier > 1 (I == 1,
    O = C * mult) pays the same quantize/dequantize overhead as
    multiplier 1 — the skip must cover it.  A non-multiple O (not a valid
    grouped conv over C) stays on the int8 path."""
    weight_q = {'dw2': (jnp.zeros((3, 3, 1, 32), jnp.int8), jnp.ones(32)),
                'odd': (jnp.zeros((3, 3, 1, 24), jnp.int8), jnp.ones(24))}
    scales = {'dw2': 0.1, 'odd': 0.1}
    policy = int8_ops.Int8ServingPolicy(weight_q, scales)
    fn = lambda xv, kv, acc_dtype=None: jnp.zeros(
        (1, 1, 1, kv.shape[-1]), jnp.int32)
    # multiplier-2 depthwise over 16 input channels: skipped (None)
    assert policy.run_contraction(
        'dw2', jnp.zeros((1, 8, 8, 16)), jnp.zeros((3, 3, 1, 32)), fn) is None
    # O=24 is not a multiple of C=16: not a valid depthwise-over-C, int8 runs
    assert policy.run_contraction(
        'odd', jnp.zeros((1, 8, 8, 16)), jnp.zeros((3, 3, 1, 24)),
        fn) is not None
