"""Checkpoint backends: msgpack (sync) + orbax (async) roundtrips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.core import checkpoint as ckpt_lib


def _state():
    from pocketflow_tpu.learners.abstract_learner import TrainState
    return TrainState(
        step=jnp.asarray(7, jnp.int32),
        params={'conv': {'kernel': jnp.arange(12.0).reshape(3, 4)}},
        batch_stats={'bn': {'mean': jnp.ones(4)}},
        opt_state=(), extra=None)


def test_msgpack_roundtrip(tmp_path):
    state = _state()
    path = str(tmp_path / 'm' / 'model.ckpt')
    with FLAGS.scope(ckpt_backend='msgpack'):
        ckpt_lib.save(path, state, 7)
        zero = jax.tree_util.tree_map(jnp.zeros_like, state)
        restored = ckpt_lib.restore_latest(path, zero)
    np.testing.assert_array_equal(np.asarray(restored.params['conv']['kernel']),
                                  np.arange(12.0).reshape(3, 4))
    assert int(restored.step) == 7


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip('orbax.checkpoint')
    state = _state()
    path = str(tmp_path / 'o' / 'model.ckpt')
    with FLAGS.scope(ckpt_backend='orbax'):
        ckpt_lib.save(path, state, 7)
        ckpt_lib.wait_for_async_saves()
        zero = jax.tree_util.tree_map(jnp.zeros_like, state)
        restored = ckpt_lib.restore_latest(path, zero)
    np.testing.assert_array_equal(np.asarray(restored.params['conv']['kernel']),
                                  np.arange(12.0).reshape(3, 4))
    assert int(restored.step) == 7


def test_exponential_decay_schedule():
    """MobileNet-v2's staircase schedule (lrn_rate_utils.py:48-70)."""
    from pocketflow_tpu.core import schedules
    with FLAGS.scope(lrn_rate_init=0.1, batch_size_norm=128, nb_epochs_rat=1.0):
        sched = schedules.exponential_decay(128, epoch_step=2.0, decay_rate=0.5,
                                            nb_smpls_train=1280)
        # 10 batches/epoch -> decay every 20 steps
        assert float(sched(0)) == pytest.approx(0.1)
        assert float(sched(19)) == pytest.approx(0.1)
        assert float(sched(20)) == pytest.approx(0.05)
        assert float(sched(40)) == pytest.approx(0.025)


def test_speed_meter_matches_reference_formula():
    """speed = batch * summ_step / elapsed * nb_workers (reference :207-228)."""
    import time
    from pocketflow_tpu.core.metrics import SpeedMeter
    meter = SpeedMeter(batch_size=32, nb_workers=4)
    time.sleep(0.05)
    speed = meter.tick(nb_iters=10)
    assert speed > 0
    # 32 * 10 iters * 4 workers / elapsed
    assert speed == pytest.approx(32 * 10 * 4 / 0.05, rel=0.5)


def test_restore_intersecting_grafts_matching_leaves(tmp_path):
    """Name+shape intersection restore (the warm-start transplant)."""
    from pocketflow_tpu.learners.abstract_learner import TrainState
    src_state = TrainState(
        step=jnp.asarray(3, jnp.int32),
        params={'conv1': {'kernel': jnp.full((3, 3, 1, 8), 2.0)},
                'fc': {'kernel': jnp.full((8, 10), 5.0)}},
        batch_stats={}, opt_state=(), extra=None)
    path = str(tmp_path / 'src' / 'model.ckpt')
    ckpt_lib.save(path, src_state, 3)
    # target: conv1 matches (grafted), fc has a DIFFERENT shape (kept),
    # extra_conv has no source (kept)
    target = {'conv1': {'kernel': jnp.zeros((3, 3, 1, 8))},
              'fc': {'kernel': jnp.zeros((8, 21))},
              'extra_conv': {'kernel': jnp.ones((1, 1, 8, 8))}}
    out, nb = ckpt_lib.restore_intersecting(path, target)
    assert nb == 1
    np.testing.assert_array_equal(np.asarray(out['conv1']['kernel']), 2.0)
    np.testing.assert_array_equal(np.asarray(out['fc']['kernel']), 0.0)
    np.testing.assert_array_equal(np.asarray(out['extra_conv']['kernel']), 1.0)
    # prefix remap: source 'conv1/...' -> target 'vgg/conv1/...'
    target2 = {'vgg': {'conv1': {'kernel': jnp.zeros((3, 3, 1, 8))}}}
    out2, nb2 = ckpt_lib.restore_intersecting(path, target2,
                                              prefix_map={'': 'vgg/'})
    assert nb2 == 1
    np.testing.assert_array_equal(np.asarray(out2['vgg']['conv1']['kernel']), 2.0)
