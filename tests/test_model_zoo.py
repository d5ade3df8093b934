"""Model-zoo shape/finiteness coverage (SURVEY §2.4 inventory lock)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def _forward(model, shape):
    x = jnp.zeros(shape, jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    return model.apply(variables, x, train=False)


def test_lenet_helper():
    from pocketflow_tpu.nets.lenet_at_cifar10 import ModelHelper
    with FLAGS.scope(batch_size=4, batch_size_eval=4):
        helper = ModelHelper()
        out = _forward(helper.create_model(), (2, 32, 32, 3))
        assert out.shape == (2, 10)


def test_resnet20_cifar_helper():
    from pocketflow_tpu.nets.resnet_at_cifar10 import ModelHelper
    with FLAGS.scope(batch_size=4, batch_size_eval=4, resnet_size=20):
        helper = ModelHelper()
        out = _forward(helper.create_model(), (2, 32, 32, 3))
        assert out.shape == (2, 10)


@pytest.mark.parametrize('size,params_m', [(18, 11.7), (50, 25.6)])
def test_resnet_imagenet_param_counts(size, params_m):
    from pocketflow_tpu.nets.resnet import ResNetImageNet
    model = ResNetImageNet(resnet_size=size, nb_classes=1000, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    nb = sum(int(np.prod(l.shape))
             for l in jax.tree_util.tree_leaves(variables['params']))
    assert nb / 1e6 == pytest.approx(params_m, rel=0.05), nb / 1e6


def test_mobilenet_v1_param_count():
    from pocketflow_tpu.nets.mobilenet import MobileNetV1
    model = MobileNetV1(nb_classes=1000, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    nb = sum(int(np.prod(l.shape))
             for l in jax.tree_util.tree_leaves(variables['params']))
    assert nb / 1e6 == pytest.approx(4.2, rel=0.1), nb / 1e6  # ~4.2M


def test_mobilenet_v2_param_count():
    from pocketflow_tpu.nets.mobilenet import MobileNetV2
    model = MobileNetV2(nb_classes=1000, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    nb = sum(int(np.prod(l.shape))
             for l in jax.tree_util.tree_leaves(variables['params']))
    assert nb / 1e6 == pytest.approx(3.5, rel=0.1), nb / 1e6  # ~3.5M


def test_all_learners_constructible_from_factory():
    """Every --learner name must map to a working class (learner_utils)."""
    from pocketflow_tpu.learners import create_learner
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    names = ['full-prec', 'weight-sparse', 'uniform', 'uniform-tf',
             'non-uniform', 'channel', 'chn-pruned-gpu', 'chn-pruned-rmt',
             'dis-chn-pruned']
    with FLAGS.scope(batch_size=4, batch_size_eval=4, nb_smpls_train=64,
                     nb_smpls_eval=32):
        for name in names:
            learner = create_learner(None, ModelHelper(), learner_name=name)
            assert hasattr(learner, 'train') and hasattr(learner, 'evaluate')


def test_lenet_full_prec_short_training(tmp_path):
    """LeNet@CIFAR-10 trains through the standard learner path."""
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.nets.lenet_at_cifar10 import ModelHelper
    with FLAGS.scope(batch_size=8, batch_size_eval=16, nb_smpls_train=256,
                     nb_smpls_eval=64, nb_epochs_rat=0.003, lrn_rate_init=0.05,
                     save_path=str(tmp_path / 'lenet' / 'model.ckpt')):
        learner = FullPrecLearner(None, ModelHelper())
        state = learner.train()
        metrics = learner.run_eval_loop(state, learner.build_eval_step())
        assert np.isfinite(metrics['loss'])
