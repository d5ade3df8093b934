"""Packed-export save/load round trip."""

import jax
import jax.numpy as jnp
import numpy as np


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
