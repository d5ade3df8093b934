"""Learning-rate schedules.

Semantics match the reference (/root/reference/utils/lrn_rate_utils.py:23-70):
piecewise-constant and staircase-exponential decay, with the initial rate
scaled by ``batch_size / batch_size_norm`` and epoch boundaries stretched by
``nb_epochs_rat``.  Here they are pure jittable functions of the step counter
(optax-style ``step -> lr``) instead of graph ops.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

from pocketflow_tpu.config import FLAGS

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def piecewise_constant(batch_size: int,
                       idxs_epoch: Sequence[float],
                       decay_rates: Sequence[float],
                       nb_smpls_train: int) -> Schedule:
    """Piecewise-constant schedule (lrn_rate_utils.py:23-46).

    `decay_rates` has len(idxs_epoch) + 1 entries; boundaries are epochs
    (scaled by nb_epochs_rat) converted to step indices.
    """
    idxs_epoch = [e * FLAGS.nb_epochs_rat for e in idxs_epoch]
    lrn_rate_init = FLAGS.lrn_rate_init * batch_size / FLAGS.batch_size_norm
    nb_batches_per_epoch = float(nb_smpls_train) / batch_size
    bnds = jnp.asarray([int(nb_batches_per_epoch * e) for e in idxs_epoch], jnp.int32)
    vals = jnp.asarray([lrn_rate_init * r for r in decay_rates], jnp.float32)

    def schedule(step):
        # tf.train.piecewise_constant keeps the PRE-decay value at a step
        # equal to a boundary (`x <= boundary`), hence strict >
        idx = jnp.sum(jnp.asarray(step, jnp.int32) > bnds)
        return vals[idx]

    return schedule


def exponential_decay(batch_size: int,
                      epoch_step: float,
                      decay_rate: float,
                      nb_smpls_train: int) -> Schedule:
    """Staircase exponential decay (lrn_rate_utils.py:48-70)."""
    epoch_step = epoch_step * FLAGS.nb_epochs_rat
    lrn_rate_init = FLAGS.lrn_rate_init * batch_size / FLAGS.batch_size_norm
    batch_step = max(1, int(nb_smpls_train * epoch_step / batch_size))

    def schedule(step):
        power = jnp.floor(jnp.asarray(step, jnp.float32) / batch_step)
        return jnp.asarray(lrn_rate_init, jnp.float32) * jnp.power(decay_rate, power)

    return schedule


def constant(value: float) -> Schedule:
    def schedule(step):
        del step
        return jnp.asarray(value, jnp.float32)

    return schedule
