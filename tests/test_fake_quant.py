"""Unit tests for fake-quant kernels vs a NumPy closed-form reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocketflow_tpu.ops import fake_quant as fq


def _np_fake_quant(x, bits, axis=None):
    x = x.astype(np.float32)
    w_max = x.max(axis=axis, keepdims=axis is not None)
    w_min = x.min(axis=axis, keepdims=axis is not None)
    alpha = w_max - w_min + 1e-10
    beta = w_min
    k = 2.0 ** bits - 1.0
    return alpha * np.round((x - beta) / alpha * k) / k + beta


@pytest.mark.parametrize('bits', [2, 4, 8])
def test_per_tensor_matches_numpy(bits):
    x = np.random.default_rng(0).normal(size=(37, 19)).astype(np.float32)
    got = np.asarray(fq.fake_quant(jnp.asarray(x), jnp.asarray(bits)))
    want = _np_fake_quant(x, bits)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_per_tensor_levels():
    # with b bits there are exactly 2^b distinct levels
    x = np.linspace(-1, 1, 1000).astype(np.float32)
    got = np.asarray(fq.fake_quant(jnp.asarray(x), jnp.asarray(3)))
    assert len(np.unique(got)) <= 8


def test_split_bucket_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(25, 11)).astype(np.float32)  # 275 elements
    bucket_size = 64  # 275 -> pad 45 with last elem -> 5 buckets... wait
    got = np.asarray(fq.fake_quant_split_bucket(
        jnp.asarray(x), jnp.asarray(4), bucket_size))
    # numpy reference reproducing reference layout
    flat = x.reshape(-1)
    nb_buckets = -(-flat.size // bucket_size)
    pad = nb_buckets * bucket_size - flat.size
    padded = np.concatenate([flat, np.full(pad, flat[-1], np.float32)]) if pad else flat
    cols = padded.reshape(bucket_size, nb_buckets)
    q = _np_fake_quant(cols, 4, axis=0)
    want = q.reshape(-1)[:flat.size].reshape(x.shape)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_channel_bucket_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 3, 8, 16)).astype(np.float32)
    got = np.asarray(fq.fake_quant_channel_bucket(jnp.asarray(x), jnp.asarray(4)))
    want = _np_fake_quant(x.reshape(-1, 16), 4, axis=0).reshape(x.shape)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_ste_gradient_is_identity():
    x = jnp.asarray(np.random.default_rng(3).normal(size=(64,)).astype(np.float32))

    def loss(x):
        return jnp.sum(fq.fake_quant(x, jnp.asarray(4)) ** 2)

    g = jax.grad(loss)(x)
    # STE: d/dx sum(q(x)^2) = 2*q(x) * 1
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(fq.fake_quant(x, jnp.asarray(4))),
                               rtol=1e-5, atol=1e-6)


def test_ste_gradient_split_and_channel():
    x = jnp.asarray(np.random.default_rng(4).normal(size=(8, 16)).astype(np.float32))
    g1 = jax.grad(lambda v: jnp.sum(fq.fake_quant_split_bucket(v, jnp.asarray(4), 32)))(x)
    g2 = jax.grad(lambda v: jnp.sum(fq.fake_quant_channel_bucket(v, jnp.asarray(4))))(x)
    np.testing.assert_allclose(np.asarray(g1), np.ones_like(x))
    np.testing.assert_allclose(np.asarray(g2), np.ones_like(x))


def test_bucket_storage_accounting():
    # split: ceil(275/64)=5 buckets -> 5*64=320 bits; channel: c_out buckets
    assert fq.bucket_storage_bits((25, 11), 'split', 64) == 5 * 64
    assert fq.bucket_storage_bits((3, 3, 8, 16), 'channel', 0) == 16 * 64
    total = fq.quantized_model_bits([(10, 10)], [8], 'split', 50)
    assert total == 100 * 8 + 2 * 64


def test_with_range_nudges_zero_point_like_tf():
    """fake_quant_with_range must reproduce TF FakeQuantWithMinMaxVars'
    zero-point nudge: 0.0 is exactly representable even when the EMA range
    doesn't start at 0, matching the integer-deployment grid (round-3
    review: without the nudge, zeros quantized to range_min)."""
    from pocketflow_tpu.ops.fake_quant import fake_quant_with_range
    rng = np.random.default_rng(3)
    x = np.concatenate([np.zeros(8, np.float32),
                        rng.uniform(-1.5, 7.0, 256).astype(np.float32)])
    for rmin, rmax, bits in [(0.02, 6.1, 8.0), (-1.3, 5.7, 8.0),
                             (0.0, 6.0, 4.0), (-0.41, 0.37, 8.0)]:
        q = np.asarray(fake_quant_with_range(
            jnp.asarray(x), jnp.float32(rmin), jnp.float32(rmax),
            jnp.float32(bits)))
        # zeros stay exactly zero on the nudged grid
        np.testing.assert_array_equal(q[:8], 0.0)
        tf = pytest.importorskip('tensorflow')
        want = tf.quantization.fake_quant_with_min_max_vars(
            x, rmin, rmax, num_bits=int(bits), narrow_range=False).numpy()
        np.testing.assert_allclose(q, want, atol=2e-5)


def test_config_scope_atomic_and_cli_parity():
    """FLAGS.scope must not leak earlier overrides when a later coercion
    fails, and parse_args must match tf.app.flags: exact names only (no
    argparse prefix abbreviation) + --noflag boolean negation."""
    from pocketflow_tpu.config import FLAGS
    before = FLAGS.debug
    with pytest.raises(ValueError):
        with FLAGS.scope(debug=True, summ_step='abc'):
            pass
    assert FLAGS.debug == before  # nothing leaked

    leftovers = FLAGS.parse_args(['--mesh', 'data:8'])
    assert leftovers == ['--mesh', 'data:8']  # no prefix match onto mesh_*
    with FLAGS.scope(enbl_dst=True):
        FLAGS.parse_args(['--noenbl_dst'])
        assert FLAGS.enbl_dst is False


def test_quantization_under_jit_and_grad_in_train_like_step():
    x = jnp.asarray(np.random.default_rng(5).normal(size=(128, 32)).astype(np.float32))

    @jax.jit
    def step(x):
        q = fq.fake_quant_channel_bucket(x, jnp.asarray(8))
        return jnp.mean(q)

    assert np.isfinite(float(step(x)))
