"""Tensor-parallel sharding tests (model mesh axis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.core import mesh as mesh_lib


def test_infer_tp_sharding_rules():
    mesh = mesh_lib.build_mesh(jax.devices()[:8],
                               (mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS), (4, 2))
    tree = {
        'big_dense': jnp.zeros((512, 256)),     # shardable: 256 % 2 == 0, big
        'big_conv': jnp.zeros((3, 3, 128, 512)),
        'tiny_bias': jnp.zeros((256,)),         # too small: replicated
        'odd_last': jnp.zeros((1024, 129)),     # 129 % 2 != 0: replicated
    }
    shardings = mesh_lib.infer_tp_sharding(tree, mesh)
    assert tuple(shardings['big_dense'].spec) == (None, mesh_lib.MODEL_AXIS)
    assert tuple(shardings['big_conv'].spec)[-1] == mesh_lib.MODEL_AXIS
    assert tuple(shardings['tiny_bias'].spec) == ()
    assert tuple(shardings['odd_last'].spec) == ()


def test_tp_train_step_matches_dp_only(tmp_path):
    """Same seed, TP on vs off: losses must agree (sharding is semantics-free)."""
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper

    def run(enbl_tp, mesh_axes, per_chip_batch):
        mesh_lib.reset_global_mesh()
        mesh_lib.set_global_mesh(mesh_lib.build_mesh(
            jax.devices()[:8], (mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS),
            mesh_axes))
        with FLAGS.scope(batch_size=per_chip_batch, batch_size_eval=4,
                         nb_smpls_train=128,
                         nb_smpls_eval=32, nb_epochs_rat=0.01,
                         lrn_rate_init=0.05, enbl_tensor_parallel=enbl_tp,
                         enbl_native_loader=False):
            learner = FullPrecLearner(None, ModelHelper())
            state, tx, _ = learner.init_state()
            step = learner.build_train_step(tx)
            iterator = learner.dataset_train.build()
            losses = []
            for i in range(3):
                state, m = step(state, next(iterator),
                                jax.random.fold_in(jax.random.PRNGKey(7), i))
                losses.append(float(jax.device_get(m['accuracy'])))
            if enbl_tp:
                spec = state.params['fc3']['kernel'].sharding.spec
                assert tuple(spec)[-1] == mesh_lib.MODEL_AXIS
            return losses

    # equal GLOBAL batch (32) so the loss trajectories are comparable
    dp = run(False, (8, 1), per_chip_batch=4)
    tp = run(True, (4, 2), per_chip_batch=8)
    mesh_lib.reset_global_mesh()
    np.testing.assert_allclose(dp, tp, rtol=1e-4)


@pytest.mark.slow
def test_tp_composes_with_quantization():
    """QAT under TP: fake-quant of sharded kernels must match the DP result
    (the per-tensor min/max over a sharded kernel becomes an all-reduce)."""
    from pocketflow_tpu.learners.uniform_quantization.learner import UniformQuantLearner
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper

    def run(enbl_tp, mesh_axes, per_chip_batch):
        mesh_lib.reset_global_mesh()
        mesh_lib.set_global_mesh(mesh_lib.build_mesh(
            jax.devices()[:8], (mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS),
            mesh_axes))
        with FLAGS.scope(batch_size=per_chip_batch, batch_size_eval=4,
                         nb_smpls_train=128, nb_smpls_eval=32,
                         nb_epochs_rat=0.01, lrn_rate_init=0.05,
                         enbl_tensor_parallel=enbl_tp,
                         enbl_native_loader=False,
                         uql_weight_bits=4, uql_quantize_all_layers=True):
            learner = UniformQuantLearner(None, ModelHelper())
            state, tx, _ = learner.init_state_quant()
            step = learner.build_quant_train_step(tx)
            iterator = learner.dataset_train.build()
            accs = []
            for i in range(3):
                state, m = step(state, next(iterator),
                                jax.random.fold_in(jax.random.PRNGKey(7), i))
                accs.append(float(jax.device_get(m['accuracy'])))
            return accs

    dp = run(False, (8, 1), per_chip_batch=4)
    tp = run(True, (4, 2), per_chip_batch=8)
    mesh_lib.reset_global_mesh()
    np.testing.assert_allclose(dp, tp, rtol=1e-4)


@pytest.mark.slow
def test_tp_composes_with_weight_sparsification():
    """WS under TP: mask/backup trees follow their kernels' shardings."""
    from pocketflow_tpu.learners.weight_sparsification.learner import WeightSparseLearner
    from pocketflow_tpu.learners.weight_sparsification import masking
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    mesh_lib.reset_global_mesh()
    mesh_lib.set_global_mesh(mesh_lib.build_mesh(
        jax.devices()[:8], (mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS), (4, 2)))
    with FLAGS.scope(batch_size=8, batch_size_eval=8, nb_smpls_train=256,
                     nb_smpls_eval=64, nb_epochs_rat=0.02, lrn_rate_init=0.05,
                     enbl_tensor_parallel=True, enbl_native_loader=False,
                     ws_prune_ratio=0.5, ws_prune_ratio_prtl='uniform',
                     ws_mask_update_step=3, ws_iter_ratio_beg=0.0,
                     ws_iter_ratio_end=0.5):
        learner = WeightSparseLearner(None, ModelHelper())
        state = learner.train()
        pr = float(jax.device_get(masking.calc_prune_ratio(
            state.params, maskable_only=True)))
        assert pr == pytest.approx(0.5, abs=0.03), pr
    mesh_lib.reset_global_mesh()


@pytest.mark.slow
def test_tp_composes_with_detection_ssd():
    """TP (model-axis sharded kernels) x SSD detection trains a step on the
    4x2 mesh — detection models are not classification-only in the TP path."""
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.nets.vgg_at_pascalvoc import ModelHelper
    mesh_lib.set_global_mesh(mesh_lib.build_mesh(
        jax.devices()[:8], (mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS), (4, 2)))
    with FLAGS.scope(batch_size=8, batch_size_eval=8, nb_smpls_train=64,
                     nb_smpls_eval=32, nb_epochs_rat=0.01, voc_image_size=64,
                     enbl_tensor_parallel=True):
        learner = FullPrecLearner(None, ModelHelper())
        state, tx, _ = learner.init_state()
        step = learner.build_train_step(tx)
        metrics = None
        iterator = learner.dataset_train.build()
        state, metrics = step(state, next(iterator), jax.random.PRNGKey(0))
        got = jax.device_get(metrics)
        assert np.isfinite(got['cls_loss']) and np.isfinite(got['loc_loss'])


def test_shard_batch_places_leading_axis_on_data():
    """mesh.shard_batch: leading axis split over 'data' (regression: used a
    non-existent NamedSharding.with_spec)."""
    mesh = mesh_lib.build_mesh(jax.devices()[:8], (mesh_lib.DATA_AXIS,), (8,))
    batch = {'image': np.zeros((16, 4, 4, 3), np.uint8),
             'label': np.zeros((16,), np.int32)}
    out = mesh_lib.shard_batch(batch, mesh)
    assert out['image'].sharding.spec[0] == mesh_lib.DATA_AXIS
    assert out['label'].shape == (16,)


# ---------------------------------------------------------------------------
# TP guard matrix: every learner either trains under data:4,model:2 or raises
# the explicit DP-only error — no learner may silently mis-shard (the failure
# mode of host-surgery search phases under a TP sharding tree is a hang or
# wrong numerics, not an error message).
# ---------------------------------------------------------------------------

_TP_GUARDED = [
    # (learner_name, extra flags) — search phases built on host-side surgery
    ('channel', {}),
    ('chn-pruned-rmt', {}),
    ('dis-chn-pruned', {}),
    ('weight-sparse', {'ws_prune_ratio_prtl': 'optimal'}),
]


@pytest.mark.parametrize('name,extra', _TP_GUARDED,
                         ids=[n + ('@' + e.get('ws_prune_ratio_prtl', ''))
                              if e else n for n, e in _TP_GUARDED])
def test_tp_guarded_learners_fail_loudly(name, extra, tmp_path):
    from pocketflow_tpu.learners import create_learner
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    mesh_lib.reset_global_mesh()
    mesh_lib.set_global_mesh(mesh_lib.build_mesh(
        jax.devices()[:8], (mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS), (4, 2)))
    try:
        with FLAGS.scope(batch_size=8, batch_size_eval=8, nb_smpls_train=64,
                         nb_smpls_eval=32, nb_epochs_rat=0.01,
                         enbl_tensor_parallel=True, enbl_native_loader=False,
                         save_path=str(tmp_path / 'models/model.ckpt'),
                         log_dir=str(tmp_path / 'logs'), **extra):
            learner = create_learner(None, ModelHelper(), learner_name=name)
            with pytest.raises(NotImplementedError, match='tensor parallelism'):
                learner.train()
    finally:
        mesh_lib.reset_global_mesh()


_TP_TRAINING = [
    ('full-prec', {}),
    ('weight-sparse', {'ws_prune_ratio_prtl': 'uniform', 'ws_prune_ratio': 0.5,
                       'ws_mask_update_step': 3}),
    ('uniform', {'uql_weight_bits': 8}),
    ('uniform-tf', {}),
    ('non-uniform', {'nuql_weight_bits': 8}),
    ('chn-pruned-gpu', {'cpg_prune_ratio': 0.25, 'cpg_nb_iters_layer': 4}),
]


@pytest.mark.slow
@pytest.mark.parametrize('name,extra', _TP_TRAINING,
                         ids=[n for n, _ in _TP_TRAINING])
def test_tp_training_learners_train(name, extra, tmp_path):
    """The non-guarded learners must actually train under data:4,model:2:
    finite eval loss and a params tree whose large kernels stay TP-sharded."""
    from pocketflow_tpu.learners import create_learner
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    mesh_lib.reset_global_mesh()
    mesh_lib.set_global_mesh(mesh_lib.build_mesh(
        jax.devices()[:8], (mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS), (4, 2)))
    try:
        with FLAGS.scope(batch_size=8, batch_size_eval=8, nb_smpls_train=128,
                         nb_smpls_eval=32, nb_epochs_rat=0.02,
                         lrn_rate_init=0.05,
                         enbl_tensor_parallel=True, enbl_native_loader=False,
                         save_path=str(tmp_path / 'models/model.ckpt'),
                         log_dir=str(tmp_path / 'logs'), **extra):
            # compression learners restore the full-prec baseline first
            if name != 'full-prec':
                base = create_learner(None, ModelHelper(),
                                      learner_name='full-prec')
                base.train()
            learner = create_learner(None, ModelHelper(), learner_name=name)
            state = learner.train()
            leaves = jax.tree_util.tree_leaves(state.params)
            assert all(bool(jnp.all(jnp.isfinite(
                leaf.astype(jnp.float32)))) for leaf in leaves)
    finally:
        mesh_lib.reset_global_mesh()
