"""Export -> load_serving_model round trips for every export mode (the
reference's import-frozen-graph-and-check serving story)."""

import os

import jax
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def _trained_resnet20(tmp_path):
    from pocketflow_tpu.core import checkpoint as ckpt_lib
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.nets.resnet_at_cifar10 import ModelHelper
    learner = FullPrecLearner(None, ModelHelper())
    state, tx, _ = learner.init_state()
    step = learner.build_train_step(tx)
    it = learner.dataset_train.build()
    for i in range(3):  # a few steps so BN stats are non-trivial
        state, _ = step(state, next(it), jax.random.PRNGKey(i))
    ckpt = str(tmp_path / 'models' / 'model.ckpt')
    ckpt_lib.save(ckpt, state, 3)
    return learner, state, ckpt


def _cli(ckpt, out, mode):
    from pocketflow_tpu.tools import export_cli
    return export_cli.main([
        '--export_model=resnet_at_cifar10', '--resnet_size=20',
        '--synthetic_data', '--compute_dtype=float32',
        '--ckpt_path=%s' % ckpt, '--export_mode=%s' % mode,
        '--output_path=%s' % out])


@pytest.fixture()
def small_scope():
    with FLAGS.scope(batch_size=4, batch_size_eval=4, resnet_size=20,
                     nb_smpls_train=64, nb_smpls_eval=32,
                     compute_dtype='float32'):
        yield


def test_plain_artifact_serves_bn_model_exactly(tmp_path, small_scope):
    # deliberately NOT marked slow: the default gate keeps one serving-loader
    # exactness representative (ADVICE r3 #5) — the quant/residual variants
    # cover the remaining artifact modes in the slow suite
    from pocketflow_tpu.tools.serving import load_serving_model
    learner, state, ckpt = _trained_resnet20(tmp_path)
    out = _cli(ckpt, str(tmp_path / 'exp' / 'plain'), 'plain')
    model = learner.model
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3)),
                   np.float32)
    live = {'params': jax.device_get(state.params),
            'batch_stats': jax.device_get(state.batch_stats)}
    ref = np.asarray(model.apply(live, x, train=False))
    smodel, svars = load_serving_model(out, model)
    # the artifact carried BN stats: eval logits reproduce exactly
    assert svars['batch_stats']
    got = np.asarray(smodel.apply(svars, x, train=False))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_quant_artifact_serves_dequantized(tmp_path, small_scope):
    from pocketflow_tpu.tools.serving import load_serving_model
    learner, state, ckpt = _trained_resnet20(tmp_path)
    with FLAGS.scope(uql_weight_bits=8):
        out = _cli(ckpt, str(tmp_path / 'exp' / 'quant'), 'quant')
    model = learner.model
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3)),
                   np.float32)
    live = {'params': jax.device_get(state.params),
            'batch_stats': jax.device_get(state.batch_stats)}
    ref = np.asarray(model.apply(live, x, train=False))
    smodel, svars = load_serving_model(out, model)
    got = np.asarray(smodel.apply(svars, x, train=False))
    # 8-bit weight quantization noise only
    spread = float(ref.max() - ref.min()) + 1e-6
    assert float(np.max(np.abs(got - ref))) < 0.1 * spread


@pytest.mark.slow
def test_residual_artifact_serves_shrunk_model(tmp_path, small_scope):
    from pocketflow_tpu.tools.serving import load_serving_model
    from tests.test_shrink_residual import _zero_in_channels
    learner, state, ckpt = _trained_resnet20(tmp_path)
    # zero trunk channels consistently (incl. fc rows) so the shrink has work
    params = _zero_in_channels(jax.device_get(state.params), [0, 1, 2])
    state = state.replace(params=params)
    from pocketflow_tpu.core import checkpoint as ckpt_lib
    ckpt_lib.save(ckpt, state, 4)
    out = _cli(ckpt, str(tmp_path / 'exp' / 'resid'), 'chn-pruned-residual')
    model = learner.model
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3)),
                   np.float32)
    live = {'params': jax.device_get(state.params),
            'batch_stats': jax.device_get(state.batch_stats)}
    ref = np.asarray(model.apply(live, x, train=False))
    smodel, svars = load_serving_model(out, model)
    # physically smaller parameterization, identical logits
    nb_small = sum(int(np.prod(np.shape(l)))
                   for l in jax.tree_util.tree_leaves(svars['params']))
    nb_dense = sum(int(np.prod(np.shape(l)))
                   for l in jax.tree_util.tree_leaves(live['params']))
    assert nb_small < nb_dense
    got = np.asarray(smodel.apply(svars, x, train=False))
    np.testing.assert_allclose(got, ref, atol=1e-4)
