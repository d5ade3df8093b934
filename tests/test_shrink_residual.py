"""Residual-aware physical channel shrink (tools/shrink_graph.py).

Reference behavior being matched: channel_pruner.py:579-586 +
model_wrapper.py:31-369 — pruned channels are removed from producer convs
across skip connections, not just masked in consumers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def _zero_in_channels(params, channels, skip_in_dims=(3,)):
    """Zero input channels `channels` of every conv kernel (except stems whose
    in-dim is in skip_in_dims) and the matching fc rows — simulating a
    channel-pruned checkpoint where every consumer agrees."""
    def visit(node):
        for name, child in node.items():
            if isinstance(child, dict):
                if 'kernel' in child:
                    k = np.array(child['kernel'])
                    if k.ndim == 4 and k.shape[2] == 1:  # depthwise
                        pass
                    elif k.ndim == 4 and k.shape[2] not in skip_in_dims:
                        k[:, :, channels, :] = 0.0
                        child['kernel'] = k
                    elif k.ndim == 2:
                        k[list(channels), :] = 0.0
                        child['kernel'] = k
                else:
                    visit(child)
    visit(params)
    return params


def _build_resnet20():
    from pocketflow_tpu.nets.resnet import ResNetCifar
    model = ResNetCifar(nb_blocks=3, nb_classes=10, dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, x


@pytest.mark.slow
def test_capture_graph_finds_residual_merges():
    from pocketflow_tpu.tools import shrink_graph as sg
    model, variables, x = _build_resnet20()
    graph = sg.capture_conv_graph(model, variables, x.shape)
    # every conv + the fc shows up as a consumer site
    consumers = {s.consumer for s in graph.sites}
    assert 'conv_init' in consumers and 'fc' in consumers
    assert 'stage1_block0/conv1' in consumers
    # residual merge: stage1_block1's conv1 input is fed by BOTH the previous
    # block's conv2 AND the carried shortcut (conv_init across two adds)
    site = next(s for s in graph.sites if s.consumer == 'stage1_block1/conv1')
    assert site.clean
    assert 'stage1_block0/conv2' in site.producers
    assert 'conv_init' in site.producers  # identity shortcut carries through
    # the head producer is protected (its output leaves the model)
    assert 'fc' in graph.protected


@pytest.mark.slow
def test_clamp_keeps_provenance_and_gating_protects():
    """Round-3 review: lax.clamp's DATA operand is invals[1] (relu6 via
    jnp.clip must not drop the conv's provenance), and SE-style gating
    (mul with a broadcast tracked gate) must PROTECT both producers instead
    of silently dropping one side."""
    import flax.linen as nn
    from pocketflow_tpu.tools import shrink_graph as sg

    class ClipNet(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), name='conv1')(x)
            x = jnp.clip(x, 0.0, 6.0)          # relu6 via lax.clamp
            x = nn.Conv(8, (3, 3), name='conv2')(x)
            return x.mean(axis=(1, 2))

    model = ClipNet()
    x = jnp.zeros((2, 8, 8, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    graph = sg.capture_conv_graph(model, variables, x.shape)
    site = next(s for s in graph.sites if s.consumer == 'conv2')
    assert site.clean and 'conv1' in site.producers

    class GateNet(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            f = nn.Conv(8, (3, 3), name='feat')(x)
            g = f.mean(axis=(1, 2), keepdims=True)
            g = nn.Conv(8, (1, 1), name='gate')(g)
            y = f * jax.nn.sigmoid(g)          # SE gating: broadcast mul
            y = nn.Conv(8, (3, 3), name='head')(y)
            return y.mean(axis=(1, 2))

    model = GateNet()
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    graph = sg.capture_conv_graph(model, variables, x.shape)
    # both sides of the gate mul are read with unalignable channel axes:
    # their producers must be protected so no other clean consumer shrinks
    # them out from under the gating
    assert 'feat' in graph.protected and 'gate' in graph.protected


def test_resnet_shrink_is_exact_and_physical():
    from pocketflow_tpu.tools import shrink_graph as sg
    model, variables, x = _build_resnet20()
    params = jax.device_get(variables['params'])
    batch_stats = jax.device_get(variables['batch_stats'])
    # make the logits non-trivial
    images = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    params = _zero_in_channels(params, [0, 1])

    ref = model.apply({'params': params, 'batch_stats': batch_stats},
                      images, train=False)

    graph = sg.capture_conv_graph(model, {'params': params,
                                          'batch_stats': batch_stats}, x.shape)
    packed, manifest = sg.shrink_residual_aware(params, batch_stats, graph)
    assert manifest['components'], 'no components were shrunk'

    # physical: the stage-1 residual trunk lost channels on the PRODUCER side
    trunk = next(c for c in manifest['components']
                 if 'stage1_block0/conv2' in c['producers'])
    assert 'conv_init' in trunk['producers'], 'skip connection not followed'
    assert trunk['orig_channels'] == 16
    assert len(trunk['kept_channels']) == 14
    assert packed['stage1_block0/conv2/kernel'].shape[-1] == 14
    assert packed['conv_init/kernel'].shape[-1] == 14
    assert packed['bn_init/bn/scale'].shape == (14,)
    assert packed['batch_stats/bn_init/bn/mean'].shape == (14,)
    # consumer side shrank too
    assert packed['stage1_block1/conv1/kernel'].shape[2] == 14
    assert packed['fc/kernel'].shape[0] == 62  # 64 - 2

    # exactness: scatter back to dense and compare logits bit-for-bit
    dense_p, dense_s = sg.expand_to_dense(packed, manifest, params, batch_stats)
    out = model.apply({'params': dense_p, 'batch_stats': dense_s},
                      images, train=False)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


@pytest.mark.slow
def test_mobilenet_shrink_follows_depthwise():
    from pocketflow_tpu.tools import shrink_graph as sg
    from pocketflow_tpu.nets.mobilenet import MobileNetV1
    with FLAGS.scope(batch_size=2):
        model = MobileNetV1(nb_classes=10, dtype=jnp.float32)
        x = jnp.zeros((2, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = jax.device_get(variables['params'])
    batch_stats = jax.device_get(variables['batch_stats'])
    params = _zero_in_channels(params, [0])
    images = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    ref = model.apply({'params': params, 'batch_stats': batch_stats},
                      images, train=False)

    graph = sg.capture_conv_graph(model, {'params': params,
                                          'batch_stats': batch_stats}, x.shape)
    assert graph.depthwise, 'depthwise convs not detected'
    packed, manifest = sg.shrink_residual_aware(params, batch_stats, graph)
    assert manifest['components']
    # find a component whose consumers include a depthwise conv: the dw
    # kernel must shrink along its channel axis together with the producer
    dw_comp = next((c for c in manifest['components']
                    if any(cons in graph.depthwise for cons in c['consumers'])),
                   None)
    assert dw_comp is not None
    dw_path = next(cons for cons in dw_comp['consumers']
                   if cons in graph.depthwise)
    assert packed[dw_path + '/kernel'].shape[3] == len(dw_comp['kept_channels'])

    dense_p, dense_s = sg.expand_to_dense(packed, manifest, params, batch_stats)
    out = model.apply({'params': dense_p, 'batch_stats': dense_s},
                      images, train=False)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_export_cli_residual_mode(tmp_path):
    """chn-pruned-residual export: artifact + FLOPs audit + exact self-check."""
    import json
    import os
    from pocketflow_tpu.core import checkpoint as ckpt_lib
    from pocketflow_tpu.nets.resnet_at_cifar10 import ModelHelper
    from pocketflow_tpu.learners.full_precision import FullPrecLearner

    with FLAGS.scope(batch_size=4, batch_size_eval=4, resnet_size=20,
                     nb_smpls_train=64, nb_smpls_eval=32,
                     compute_dtype='float32'):
        learner = FullPrecLearner(None, ModelHelper())
        state, _, _ = learner.init_state()
        params = jax.device_get(state.params)
        params = _zero_in_channels(params, [0, 1, 2])
        state = state.replace(params=params)
        ckpt = str(tmp_path / 'models' / 'model.ckpt')
        ckpt_lib.save(ckpt, state, 0)

        from pocketflow_tpu.tools import export_cli
        out = export_cli.main([
            '--export_model=resnet_at_cifar10', '--resnet_size=20',
            '--synthetic_data', '--compute_dtype=float32',
            '--ckpt_path=%s' % ckpt,
            '--export_mode=chn-pruned-residual',
            '--output_path=%s' % (tmp_path / 'export' / 'model')])
    assert os.path.exists(out)
    with open(out + '.manifest.json') as fin:
        manifest = json.load(fin)
    audit = manifest['flops_audit']
    assert audit['reduction'] > 0.1  # 3 of 16 trunk channels gone everywhere
    assert manifest['components']


def test_export_cli_residual_tflite_is_physically_smaller(tmp_path):
    """chn-pruned-residual + --tflite_mode: the .tflite holds the SHRUNK
    convs (reference export_chn_pruned_tflite_model.py:223-277), so the
    flatbuffer is smaller than the dense export and logits still match."""
    import os
    pytest.importorskip('tensorflow')
    from pocketflow_tpu.core import checkpoint as ckpt_lib
    from pocketflow_tpu.nets.resnet_at_cifar10 import ModelHelper
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.tools import export_cli, export_tflite

    with FLAGS.scope(batch_size=4, batch_size_eval=4, resnet_size=20,
                     nb_smpls_train=64, nb_smpls_eval=32,
                     compute_dtype='float32'):
        learner = FullPrecLearner(None, ModelHelper())
        state, _, _ = learner.init_state()
        params = jax.device_get(state.params)
        params = _zero_in_channels(params, [0, 1, 2, 3, 4, 5])
        state = state.replace(params=params)
        ckpt = str(tmp_path / 'models' / 'model.ckpt')
        ckpt_lib.save(ckpt, state, 0)

        common = ['--export_model=resnet_at_cifar10', '--resnet_size=20',
                  '--synthetic_data', '--compute_dtype=float32',
                  '--ckpt_path=%s' % ckpt]
        export_cli.main(common + [
            '--export_mode=plain', '--tflite_mode=float',
            '--output_path=%s' % (tmp_path / 'exp' / 'dense')])
        export_cli.main(common + [
            '--export_mode=chn-pruned-residual', '--tflite_mode=float',
            '--output_path=%s' % (tmp_path / 'exp' / 'shrunk')])
        dense_blob = open(str(tmp_path / 'exp' / 'dense.tflite'), 'rb').read()
        shrunk_blob = open(str(tmp_path / 'exp' / 'shrunk.tflite'), 'rb').read()
        assert len(shrunk_blob) < 0.85 * len(dense_blob)
        # logits parity dense vs shrunk artifact on a shared batch
        x = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3)),
                       np.float32)
        a = export_tflite.run_tflite(dense_blob, x)
        b = export_tflite.run_tflite(shrunk_blob, x)
        np.testing.assert_allclose(a, b, atol=5e-3)


def test_shrunk_model_serves_with_smaller_convs():
    """The reference export rebuilds the graph with SMALLER convs ('alt
    routines'); here the zoo model takes a width_map and serves the shrunk
    checkpoint with identical logits."""
    from pocketflow_tpu.tools import shrink_graph as sg
    from pocketflow_tpu.nets.resnet import ResNetCifar
    model, variables, x = _build_resnet20()
    params = jax.device_get(variables['params'])
    batch_stats = jax.device_get(variables['batch_stats'])
    params = _zero_in_channels(params, [0, 1, 2, 3])
    images = jax.random.normal(jax.random.PRNGKey(3), x.shape)
    ref = model.apply({'params': params, 'batch_stats': batch_stats},
                      images, train=False)

    graph = sg.capture_conv_graph(model, {'params': params,
                                          'batch_stats': batch_stats}, x.shape)
    packed, manifest = sg.shrink_residual_aware(params, batch_stats, graph)
    wm = sg.width_map_from_packed(packed)
    assert wm['stage1_block0/conv1'] == 12  # 16 - 4 physically gone

    small = ResNetCifar(nb_blocks=3, nb_classes=10, dtype=jnp.float32,
                        width_map=wm)
    small_vars = sg.variables_from_packed(packed)
    out = small.apply(small_vars, images, train=False)
    # identical logits from the physically smaller network (dead channels
    # contributed exactly zero in the dense model)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-5)
    # and it really is smaller
    nb_small = sum(int(np.prod(np.shape(l)))
                   for l in jax.tree_util.tree_leaves(small_vars['params']))
    nb_orig = sum(int(np.prod(np.shape(l)))
                  for l in jax.tree_util.tree_leaves(params))
    assert nb_small < nb_orig


@pytest.mark.slow
def test_mobilenet_width_mapped_serving():
    """MobileNet-v1 (the reference's channel-pruning model family) serves the
    shrunk checkpoint through width_map with identical logits."""
    from pocketflow_tpu.tools import shrink_graph as sg
    from pocketflow_tpu.nets.mobilenet import MobileNetV1
    with FLAGS.scope(batch_size=2):
        model = MobileNetV1(nb_classes=10, dtype=jnp.float32)
        x = jnp.zeros((2, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = jax.device_get(variables['params'])
    batch_stats = jax.device_get(variables['batch_stats'])
    params = _zero_in_channels(params, [0, 1])
    images = jax.random.normal(jax.random.PRNGKey(4), x.shape)
    ref = model.apply({'params': params, 'batch_stats': batch_stats},
                      images, train=False)

    graph = sg.capture_conv_graph(model, {'params': params,
                                          'batch_stats': batch_stats}, x.shape)
    packed, manifest = sg.shrink_residual_aware(params, batch_stats, graph)
    wm = sg.width_map_from_packed(packed)
    small = MobileNetV1(nb_classes=10, dtype=jnp.float32, width_map=wm)
    small_vars = sg.variables_from_packed(packed)
    out = small.apply(small_vars, images, train=False)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-5)
    # depthwise channel counts follow their producer automatically
    dw_k = small_vars['params']['block02']['dw']['kernel']
    pw_prev = small_vars['params']['block01']['pw']['kernel']
    assert dw_k.shape[3] == pw_prev.shape[3]


@pytest.mark.slow
def test_int8_serving_composes_with_shrunk_model():
    """Compression policies (int8 PTQ) apply unchanged to width-mapped
    shrunk models — the deployment stack composes."""
    from pocketflow_tpu.tools import shrink_graph as sg
    from pocketflow_tpu.nets.resnet import ResNetCifar
    from pocketflow_tpu.ops import int8_ops
    from pocketflow_tpu.nn.layers import compression
    model, variables, x = _build_resnet20()
    params = jax.device_get(variables['params'])
    batch_stats = jax.device_get(variables['batch_stats'])
    params = _zero_in_channels(params, [0, 1])
    images = jax.random.normal(jax.random.PRNGKey(5), x.shape) * 0.5

    graph = sg.capture_conv_graph(model, {'params': params,
                                          'batch_stats': batch_stats}, x.shape)
    packed, _ = sg.shrink_residual_aware(params, batch_stats, graph)
    small = ResNetCifar(nb_blocks=3, nb_classes=10, dtype=jnp.float32,
                        width_map=sg.width_map_from_packed(packed))
    small_vars = sg.variables_from_packed(packed)
    ref = np.asarray(small.apply(small_vars, images, train=False))

    act_scales = int8_ops.calibrate(small, small_vars, [images])
    weight_q = int8_ops.quantize_model_weights(small_vars['params'])
    policy = int8_ops.Int8ServingPolicy(weight_q, act_scales)
    with compression(policy):
        out = np.asarray(small.apply(small_vars, images, train=False))
    rel = np.abs(out - ref) / (np.abs(ref).max() + 1e-6)
    assert rel.max() < 0.15, rel.max()
