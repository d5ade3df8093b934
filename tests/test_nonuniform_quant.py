"""Tests for codebook (non-uniform) quantization: kernel numerics + learner."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.ops import nonuniform_quant as nuq


def test_codebook_assignment_matches_numpy():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
    c = nuq.init_codebook(x, bits=2, init_style='uniform',
                          bucket_type=None, bucket_size=256)
    q = np.asarray(nuq.nonuniform_quant(x, c, None, 256))
    # numpy reference: normalize, snap to nearest cluster, denormalize
    xn = np.asarray(x, np.float64)
    alpha = xn.max() - xn.min() + 1e-10
    beta = xn.min()
    x_norm = (xn - beta) / alpha
    c_np = np.asarray(c).reshape(-1)
    idx = np.argmin(np.abs(x_norm.reshape(-1, 1) - c_np[None, :]), axis=1)
    expected = (alpha * c_np[idx] + beta).reshape(x.shape)
    np.testing.assert_allclose(q, expected, rtol=1e-5, atol=1e-6)
    assert len(np.unique(q)) <= 4  # 2 bits -> k=4 clusters


def test_codebook_quantile_init_monotone():
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 16))
    c = np.asarray(nuq.init_codebook(x, bits=3, init_style='quantile',
                                     bucket_type=None, bucket_size=256))
    assert c.shape == (8, 1)
    assert np.all(np.diff(c[:, 0]) >= 0)  # percentiles are sorted
    assert np.all((c >= 0.0) & (c <= 1.0))


def test_ste_and_cluster_gradients():
    """d q/d x = identity (STE); d q/d c = alpha * segment counts."""
    x = jnp.asarray(np.linspace(-1.0, 1.0, 256).reshape(16, 16), jnp.float32)
    c = nuq.init_codebook(x, bits=2, init_style='uniform',
                          bucket_type=None, bucket_size=256)

    def f(xx, cc):
        return jnp.sum(nuq.nonuniform_quant(xx, cc, None, 256))

    gx, gc = jax.grad(f, argnums=(0, 1))(x, c)
    np.testing.assert_allclose(np.asarray(gx), np.ones_like(gx), rtol=1e-6)
    # cluster grads: alpha * (# assigned); total = alpha * n
    alpha = float(np.max(np.asarray(x)) - np.min(np.asarray(x)) + 1e-10)
    np.testing.assert_allclose(float(jnp.sum(gc)), alpha * x.size, rtol=1e-4)
    assert np.all(np.asarray(gc) >= 0)


def test_split_bucket_roundtrip_shapes():
    x = jax.random.normal(jax.random.PRNGKey(2), (7, 13))  # 91 elems, pad to 128
    c = nuq.init_codebook(x, bits=2, init_style='uniform',
                          bucket_type='split', bucket_size=32)
    assert c.shape == (4, 3)  # ceil(91/32)=3 buckets
    q = nuq.nonuniform_quant(x, c, 'split', 32)
    assert q.shape == x.shape
    assert np.all(np.isfinite(np.asarray(q)))


@pytest.mark.slow
def test_nonuniform_learner_end_to_end(tmp_path):
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.learners.nonuniform_quantization.learner import NonUniformQuantLearner
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    with FLAGS.scope(batch_size=16, nb_smpls_train=480, nb_smpls_eval=128,
                     batch_size_eval=32, nb_epochs_rat=0.05, lrn_rate_init=0.05):
        FullPrecLearner(None, ModelHelper()).train()
        with FLAGS.scope(nuql_weight_bits=4, nuql_quant_epochs=8,
                         nuql_opt_mode='both', nuql_quantize_all_layers=False,
                         nuql_save_quant_model_path=str(tmp_path / 'nuql' / 'model.ckpt')):
            learner = NonUniformQuantLearner(None, ModelHelper())
            state = learner.train()
            metrics = learner.run_eval_loop(state, learner.build_quant_eval_step())
            assert metrics['accuracy'] > 0.5
