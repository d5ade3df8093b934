"""Tests for fused fake-quant QAT (uniform quantization learner + bit search)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def _convnet_helper():
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    return ModelHelper()


def test_discover_quant_sites_counts():
    from pocketflow_tpu.learners.uniform_quantization import utils as uq_utils
    helper = _convnet_helper()
    with FLAGS.scope(batch_size=4, batch_size_eval=4, nb_smpls_train=64,
                     nb_smpls_eval=32):
        model = helper.create_model()
        sample = jnp.zeros((2, 28, 28, 1), jnp.float32)
        variables = helper.init_model(jax.random.PRNGKey(0), sample)
        with FLAGS.scope(uql_quantize_all_layers=True):
            stats = uq_utils.discover_quant_sites(model, variables, sample)
        assert stats['nb_matmuls'] == 4  # conv1, conv2, fc3, fc4
        assert stats['nb_activations'] == 3  # three relu sites
        with FLAGS.scope(uql_quantize_all_layers=False):
            stats = uq_utils.discover_quant_sites(model, variables, sample)
        assert stats['nb_matmuls'] == 2  # first & last stay full precision
        assert stats['weight_paths'] == ['conv2', 'fc3']


def test_quant_policy_quantizes_weights():
    """w at 2 bits -> at most 4 distinct values per scaling group."""
    from pocketflow_tpu.learners.uniform_quantization.utils import QuantPolicy
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 16))
    with FLAGS.scope(uql_use_buckets=False):
        policy = QuantPolicy(['conv'], jnp.asarray([2.0]), jnp.zeros(0))
        q = policy.process_weight('conv', w)
        assert len(np.unique(np.asarray(q))) <= 4
        # 32 bits = passthrough
        policy32 = QuantPolicy(['conv'], jnp.asarray([32.0]), jnp.zeros(0))
        q32 = policy32.process_weight('conv', w)
        np.testing.assert_array_equal(np.asarray(q32), np.asarray(w))
        # unlisted path untouched
        np.testing.assert_array_equal(
            np.asarray(policy.process_weight('other', w)), np.asarray(w))


def test_quant_policy_channel_buckets():
    from pocketflow_tpu.learners.uniform_quantization.utils import QuantPolicy
    w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 4, 8))
    with FLAGS.scope(uql_use_buckets=True, uql_bucket_type='channel'):
        policy = QuantPolicy(['conv'], jnp.asarray([2.0]), jnp.zeros(0))
        q = np.asarray(policy.process_weight('conv', w))
    for c in range(8):  # each output channel has its own 4-level codomain
        assert len(np.unique(q[..., c])) <= 4


@pytest.mark.slow
def test_uniform_quant_end_to_end(tmp_path):
    """Pretrain a baseline, then QAT at 8 bits keeps accuracy."""
    from pocketflow_tpu.learners.full_precision import FullPrecLearner
    from pocketflow_tpu.learners.uniform_quantization.learner import UniformQuantLearner
    with FLAGS.scope(batch_size=16, nb_smpls_train=480, nb_smpls_eval=128,
                     batch_size_eval=32, nb_epochs_rat=0.05, lrn_rate_init=0.05):
        FullPrecLearner(None, _convnet_helper()).train()  # writes FLAGS.save_path

        with FLAGS.scope(uql_weight_bits=8, uql_quant_epochs=8,
                         uql_quantize_all_layers=True,
                         uql_save_quant_model_path=str(
                             tmp_path / 'uql' / 'model.ckpt')):
            learner = UniformQuantLearner(None, _convnet_helper())
            state = learner.train()
            metrics = learner.run_eval_loop(state, learner.build_quant_eval_step())
            assert metrics['accuracy'] > 0.5


@pytest.mark.slow
def test_bit_optimizer_rl_search(tmp_path):
    """Tiny DDPG bit search must respect the bit budget."""
    from pocketflow_tpu.learners.uniform_quantization.learner import UniformQuantLearner
    from pocketflow_tpu.learners.uniform_quantization.bit_optimizer import BitOptimizer
    with FLAGS.scope(batch_size=16, nb_smpls_train=256, nb_smpls_eval=64,
                     batch_size_eval=16, nb_epochs_rat=0.01, lrn_rate_init=0.05,
                     uql_enbl_rl_agent=True, uql_nb_rlouts=3,
                     uql_tune_global_steps=4, uql_equivalent_bits=4,
                     uql_quantize_all_layers=True):
        learner = UniformQuantLearner(None, _convnet_helper())
        # the search must draw rewards from the train/val split, never the
        # eval (test) set -- poison it to be sure
        learner.dataset_eval.build = lambda *a, **k: (_ for _ in ()).throw(
            AssertionError('bit search read the eval set'))
        state, _, _ = learner.init_state_quant()
        w_bits, a_bits = BitOptimizer(learner, state).run()
        assert len(w_bits) == 4 and len(a_bits) == 3
        num_weights = learner.statistics['num_weights']
        total_bits = sum(n * b for n, b in zip(num_weights, w_bits))
        budget = sum(num_weights) * 4
        assert total_bits <= budget + max(num_weights)  # last-layer floor rounding
        assert all(FLAGS.uql_w_bit_min <= b <= FLAGS.uql_w_bit_max or b >= 1
                   for b in w_bits)
