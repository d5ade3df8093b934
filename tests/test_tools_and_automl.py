"""Tests for export/benchmark/convert tools and the AutoML outer loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def test_shrink_channel_pruned():
    from pocketflow_tpu.tools.export import shrink_channel_pruned
    k = np.random.default_rng(0).normal(size=(3, 3, 8, 16)).astype(np.float32)
    k[:, :, [1, 3, 5], :] = 0.0  # three pruned input channels
    params = {'conv': {'kernel': jnp.asarray(k), 'bias': jnp.zeros(16)}}
    packed, manifest = shrink_channel_pruned(params)
    assert packed['conv/kernel'].shape == (3, 3, 5, 16)
    assert manifest['conv/kernel']['kept_in_channels'] == [0, 2, 4, 6, 7]
    assert manifest['conv/kernel']['orig_in_channels'] == 8


def test_pack_unpack_quantized_roundtrip():
    from pocketflow_tpu.tools.export import pack_quantized, unpack_quantized
    k = np.random.default_rng(1).normal(size=(3, 3, 4, 8)).astype(np.float32)
    params = {'conv': {'kernel': jnp.asarray(k)}}
    packed = pack_quantized(params, ['conv'], [8], bucket_type='channel')
    assert packed['conv/kernel']['codes'].dtype == np.uint8
    restored = unpack_quantized(packed)
    # 8-bit round trip: max error <= alpha / (2^8-1)
    err = np.abs(restored['conv/kernel'] - k)
    per_chan_range = k.reshape(-1, 8).max(0) - k.reshape(-1, 8).min(0)
    assert np.all(err.reshape(-1, 8).max(0) <= per_chan_range / 255 + 1e-6)


def test_export_self_check_and_latency():
    from pocketflow_tpu.nets.convnet_at_fmnist import ConvNet
    from pocketflow_tpu.tools.benchmark import calc_inference_time
    from pocketflow_tpu.tools.export import numeric_self_check
    model = ConvNet(nb_classes=10, dtype=jnp.float32)
    x = jnp.zeros((2, 28, 28, 1), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    delta = numeric_self_check(model, variables, variables, x)
    assert delta == 0.0
    result = calc_inference_time(model, variables, (2, 28, 28, 1),
                                 nb_warmup=2, nb_timed=3)
    assert result['latency_ms'] > 0


def test_convert_data_format_roundtrip():
    from pocketflow_tpu.tools.convert_data_format import (
        convert_tree, flatten_dense_nchw_to_nhwc, nchw_kernel_to_nhwc,
        nhwc_kernel_to_nchw)
    k_nchw = np.random.default_rng(2).normal(size=(16, 3, 5, 5)).astype(np.float32)
    k = nchw_kernel_to_nhwc(k_nchw)
    assert k.shape == (5, 5, 3, 16)
    np.testing.assert_array_equal(nhwc_kernel_to_nchw(k), k_nchw)
    tree = {'conv': {'kernel': k_nchw.copy()}}
    out = convert_tree(tree, to_nhwc=True)
    assert out['conv']['kernel'].shape == (5, 5, 3, 16)
    # dense-after-flatten reorder keeps the matmul equivalent
    feat = np.random.default_rng(3).normal(size=(2, 2, 3)).astype(np.float32)
    dense = np.random.default_rng(4).normal(size=(12, 7)).astype(np.float32)
    y_nchw = feat.transpose(2, 0, 1).reshape(-1) @ dense
    dense_nhwc = flatten_dense_nchw_to_nhwc(dense, (2, 2, 3))
    y_nhwc = feat.reshape(-1) @ dense_nhwc
    np.testing.assert_allclose(y_nhwc, y_nchw, rtol=1e-5)


def test_metadata_roundtrip(tmp_path):
    from pocketflow_tpu.tools.add_metadata import add_metadata, read_metadata
    ckpt = str(tmp_path / 'model.ckpt-5.msgpack')
    add_metadata(ckpt, 'convnet', 'fmnist', (1, 28, 28, 1), 10)
    meta = read_metadata(ckpt)
    assert meta['model_name'] == 'convnet' and meta['nb_classes'] == 10


def test_gp_search_beats_random_on_quadratic():
    from pocketflow_tpu.automl.search import GPSearch, ParamSpec, run_automl
    specs = [ParamSpec('lrn_rate_init', 'FLOAT', 0.0, 1.0),
             ParamSpec('momentum', 'FLOAT', 0.0, 1.0)]

    def objective(params):
        return -(params['lrn_rate_init'] - 0.3) ** 2 \
            - (params['momentum'] - 0.7) ** 2

    best, best_obj, history = run_automl(objective, specs, nb_trials=30,
                                         algo='GP', seed=0)
    assert best_obj > -0.02
    assert abs(best['lrn_rate_init'] - 0.3) < 0.15
    assert abs(best['momentum'] - 0.7) < 0.15


def test_tpe_search_converges_on_quadratic():
    """TPE (the reference AutoML's other algo_type) homes in on the optimum."""
    from pocketflow_tpu.automl.search import ParamSpec, run_automl
    specs = [ParamSpec('lrn_rate_init', 'FLOAT', 0.0, 1.0),
             ParamSpec('momentum', 'FLOAT', 0.0, 1.0)]

    def objective(params):
        return -(params['lrn_rate_init'] - 0.3) ** 2 \
            - (params['momentum'] - 0.7) ** 2

    best, best_obj, history = run_automl(objective, specs, nb_trials=40,
                                         algo='TPE', seed=0)
    assert best_obj > -0.03  # worst seed measured -0.017 over 12 seeds
    assert abs(best['lrn_rate_init'] - 0.3) < 0.2
    assert abs(best['momentum'] - 0.7) < 0.2


def test_ws_constraint_repair():
    from pocketflow_tpu.automl.search import ws_constraint
    fixed = ws_constraint({'ws_iter_ratio_beg': 0.8, 'ws_iter_ratio_end': 0.2})
    assert fixed['ws_iter_ratio_beg'] <= fixed['ws_iter_ratio_end']


def test_log10_param_spec():
    from pocketflow_tpu.automl.search import ParamSpec
    spec = ParamSpec('ws_mask_update_step', 'LOG10', 50, 2000)
    rng = np.random.default_rng(0)
    for _ in range(20):
        v = spec.sample(rng)
        assert 50 <= v <= 2000
    assert abs(spec.from_unit(spec.to_unit(500.0)) - 500.0) < 1.0


def test_model_report_audits_compression(tmp_path):
    """The audit tool reports sparsity + channel survival correctly."""
    from pocketflow_tpu.nets.convnet_at_fmnist import ConvNet
    from pocketflow_tpu.tools.model_report import build_report, format_report
    model = ConvNet(nb_classes=10, dtype=jnp.float32)
    x = jnp.zeros((2, 28, 28, 1), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    params = dict(variables['params'])
    # fake compression: zero half of conv2's input channels
    k = np.asarray(params['conv2']['kernel']).copy()
    k[:, :, ::2, :] = 0.0
    params = {**params, 'conv2': {**params['conv2'], 'kernel': jnp.asarray(k)}}
    report = build_report(model, params, {}, x)
    conv2 = next(r for r in report['layers'] if r['layer'] == 'conv2')
    assert conv2['in_channels'] == 32 and conv2['in_channels_kept'] == 16
    assert 0.0 < report['overall_sparsity'] < 1.0
    text = format_report(report)
    assert 'conv2' in text and 'overall sparsity' in text
