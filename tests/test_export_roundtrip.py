"""Packed-export save/load round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_save_load_packed_roundtrip(tmp_path):
    from pocketflow_tpu.tools.export import (load_packed, pack_quantized,
                                             save_packed, unpack_quantized)
    k = np.random.default_rng(0).normal(size=(3, 3, 4, 8)).astype(np.float32)
    params = {'conv': {'kernel': jnp.asarray(k)},
              'fc': {'bias': jnp.ones(8, jnp.float32)}}
    packed = pack_quantized(params, ['conv'], [8], bucket_type='channel')
    out = save_packed(packed, {'note': 'test'}, str(tmp_path / 'model.npz'))
    loaded = load_packed(out)
    assert set(loaded) == set(packed)
    assert loaded['conv/kernel']['bits'] == 8
    np.testing.assert_array_equal(loaded['conv/kernel']['codes'],
                                  packed['conv/kernel']['codes'])
    restored = unpack_quantized(loaded)
    orig = unpack_quantized(packed)
    np.testing.assert_allclose(restored['conv/kernel'], orig['conv/kernel'],
                               rtol=1e-6)
    np.testing.assert_array_equal(loaded['fc/bias'], np.ones(8))


def test_fold_batch_norm_preserves_eval_output():
    """Folded checkpoint must produce IDENTICAL eval logits."""
    import jax
    from pocketflow_tpu.nets.resnet import ResNetCifar
    from pocketflow_tpu.tools.export import fold_batch_norm
    model = ResNetCifar(nb_blocks=1, nb_classes=10, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(1), x, train=False))()
    # make batch_stats non-trivial: run a few train steps' worth of updates
    v, st = model.apply(variables, x, train=True, mutable=['batch_stats']), None
    variables = {'params': variables['params'], 'batch_stats': v[1]['batch_stats']}
    ref = np.asarray(model.apply(variables, x, train=False))
    fp, fs = fold_batch_norm(variables['params'], variables['batch_stats'])
    out = np.asarray(model.apply({'params': fp, 'batch_stats': fs}, x, train=False))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
    # kernels actually changed (the fold did something)
    k0 = np.asarray(variables['params']['conv_init']['kernel'])
    k1 = np.asarray(fp['conv_init']['kernel'])
    assert not np.allclose(k0, k1)


@pytest.mark.slow  # ~25 s: full-MobileNet BN-fold numerics (non-slow gate <5 min)
def test_fold_batch_norm_mobilenet():
    import jax
    from pocketflow_tpu.nets.mobilenet import MobileNetV2
    from pocketflow_tpu.tools.export import fold_batch_norm
    model = MobileNetV2(nb_classes=10, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(1), x, train=False))()
    out_t, st = model.apply(variables, x, train=True, mutable=['batch_stats'])
    variables = {'params': variables['params'], 'batch_stats': st['batch_stats']}
    ref = np.asarray(model.apply(variables, x, train=False))
    fp, fs = fold_batch_norm(variables['params'], variables['batch_stats'])
    out = np.asarray(model.apply({'params': fp, 'batch_stats': fs}, x, train=False))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)
