"""Abstract model helper — the contract between nets and learners.

Rebuild of /root/reference/nets/abstract_model_helper.py:22-149.  The reference
contract is graph-mode: build_dataset_* return tf.data iterators and
forward_train/forward_eval add ops to the current graph.  The JAX contract is
functional:

* ``build_dataset_train/eval``  -> AbstractDataset objects (host pipelines),
* ``create_model``              -> a Flax module whose ``__call__(x, train)``
                                   is the forward pass for both modes,
* ``forward_train/forward_eval``-> pure functions of (variables, inputs)
                                   returning outputs (+ updated batch stats),
* ``calc_loss``                 -> pure (labels, outputs, params) -> loss, metrics,
* ``setup_lrn_rate``            -> (schedule fn, nb_iters).

Compression learners interpose via `pocketflow_tpu.nn.compression` policies
around these forward functions instead of editing any graph.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.nn.layers import compression, CompressionPolicy


class AbstractModelHelper(ABC):
    """Binds a network to a dataset; see class docstring for the contract."""

    model_name: str = 'model'
    dataset_name: str = 'dataset'

    def __init__(self, data_format: str = 'channels_last', forward_w_labels: bool = False):
        # NHWC is the TPU-native layout; channels_first exists only for
        # checkpoint-conversion tooling parity.
        assert data_format in ('channels_last', 'channels_first')
        self.data_format = data_format
        self.forward_w_labels = forward_w_labels

    # -- dataset ---------------------------------------------------------

    @abstractmethod
    def build_dataset_train(self):
        """Return the training AbstractDataset."""

    @abstractmethod
    def build_dataset_eval(self):
        """Return the evaluation AbstractDataset."""

    # -- model -----------------------------------------------------------

    @abstractmethod
    def create_model(self):
        """Return the Flax module implementing the forward pass."""

    def init_model(self, rng: jax.Array, sample_input: jax.Array) -> Dict[str, Any]:
        """Initialize variables: {'params': ..., 'batch_stats': ...}."""
        model = self.create_model()
        # jit the init: eager init dispatches op-by-op (catastrophic over a
        # remote-device tunnel); jitted it is one compiled program.
        variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
            rng, jnp.asarray(sample_input))
        return dict(variables)

    def forward_train(self, model, variables, inputs,
                      policy: Optional[CompressionPolicy] = None,
                      labels=None) -> Tuple[Any, Dict[str, Any]]:
        """Training forward pass; returns (outputs, new_model_state)."""
        del labels  # classification nets ignore labels in forward
        with compression(policy):
            outputs, new_state = model.apply(
                variables, inputs, train=True, mutable=['batch_stats'])
        return outputs, new_state

    def forward_eval(self, model, variables, inputs,
                     policy: Optional[CompressionPolicy] = None):
        """Evaluation forward pass; returns outputs."""
        with compression(policy):
            return model.apply(variables, inputs, train=False)

    # -- loss / schedule ---------------------------------------------------

    @abstractmethod
    def calc_loss(self, labels, outputs, trainable_vars) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Loss value and extra metrics (reference :96-110)."""

    @abstractmethod
    def setup_lrn_rate(self, global_batch_size: int):
        """Return (lr schedule fn, nb_iters) (reference :112-124)."""

    # -- hooks -------------------------------------------------------------

    def warm_start(self, state):
        """Initialize the model for warm-start (backbone restore); optional."""
        return state

    def dump_n_eval(self, outputs=None, action=None):
        """Dump outputs to files and evaluate (detection models); optional."""

    # -- shared loss pieces --------------------------------------------------

    @staticmethod
    def softmax_cross_entropy(labels: jax.Array, logits: jax.Array) -> jax.Array:
        """Mean softmax CE over the batch; labels are int class ids."""
        logits = logits.astype(jnp.float32)
        log_probs = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(log_probs, labels[:, None].astype(jnp.int32), axis=-1)
        return jnp.mean(nll)

    @staticmethod
    def accuracy(labels: jax.Array, logits: jax.Array, topk: int = 1) -> jax.Array:
        if topk == 1:
            return jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        top = jax.lax.top_k(logits.astype(jnp.float32), topk)[1]
        hit = jnp.any(top == labels[:, None], axis=-1)
        return jnp.mean(hit.astype(jnp.float32))

    @staticmethod
    def weight_decay_loss(params, exclude_bn: bool = True,
                          coeff: Optional[float] = None) -> jax.Array:
        """L2 weight decay over kernels (reference excludes BN params).
        `coeff` overrides the default FLAGS.loss_w_dcy coefficient."""
        total = jnp.asarray(0.0, jnp.float32)
        for path, leaf in jax.tree_util.tree_leaves_with_path(params):
            keys = [getattr(p, 'key', str(p)) for p in path]
            if exclude_bn and any('bn' in str(k) for k in keys):
                continue
            if str(keys[-1]) != 'kernel':
                continue
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
        return (FLAGS.loss_w_dcy if coeff is None else coeff) * total
