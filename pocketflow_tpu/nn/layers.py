"""Layers with compression interception points.

The reference implements compression by *rewriting the TF graph*: it walks
Conv2D/MatMul ops, splices fake-quant nodes onto weights and activations, and
reroutes inputs via `tf.contrib.graph_editor`
(/root/reference/learners/uniform_quantization/utils.py:81-199).  That whole
mechanism is unnecessary in JAX: the forward pass is a pure function, so we
interpose on weights/activations *at trace time* through a
`CompressionPolicy` installed in a dynamic context.

Every learner expresses itself as a policy:

* weight sparsification  -> ``process_weight`` multiplies by a mask,
* uniform quantization   -> ``process_weight``/``process_act`` run fake-quant
  Pallas kernels with STE,
* non-uniform quantization -> ``process_weight`` snaps to a learned codebook,
* channel pruning        -> ``process_weight`` zeroes pruned channels.

The policy receives the layer's path (e.g. ``model/conv2/kernel``) so
per-layer hyper-parameters (bits, prune ratios, codebooks) — which are traced
JAX arrays living in the learner's state pytree — resolve statically by name.

Layer set mirrors what PocketFlow's model zoo needs: Conv2D, depthwise conv,
dense, batch-norm, pooling.  All tensors are NHWC (TPU-native layout); params
are fp32, compute dtype is configurable (bf16 default) to keep the MXU fed.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

# ---------------------------------------------------------------------------
# Compression policy context
# ---------------------------------------------------------------------------


class CompressionPolicy:
    """Base (identity) policy; learners subclass and override the hooks."""

    def _next_act_index(self) -> int:
        """Trace-order counter for activation sites (reset per forward trace
        because the train step constructs a fresh policy per trace)."""
        idx = getattr(self, '_act_counter', 0)
        self._act_counter = idx + 1
        return idx

    def reset_trace(self):
        self._act_counter = 0

    def process_weight(self, path: str, kernel: jax.Array) -> jax.Array:
        """Transform a conv/dense kernel before it is used (quant/mask/prune)."""
        return kernel

    def process_act(self, path: str, act: jax.Array) -> jax.Array:
        """Transform a layer's output activation (activation fake-quant)."""
        return act

    def process_input(self, path: str, x: jax.Array) -> jax.Array:
        """Transform a layer's input (input-side channel masking)."""
        return x

    def run_contraction(self, path: str, x: jax.Array, kernel: jax.Array,
                        conv_fn) -> Optional[jax.Array]:
        """Optionally TAKE OVER a conv/dense contraction (return the output)
        or return None to run the default path.  Serving policies use this to
        execute the contraction in int8 on the MXU (ops/int8_ops.py)."""
        return None


_POLICY_STACK = []


@contextlib.contextmanager
def compression(policy: Optional[CompressionPolicy]):
    """Install `policy` for the duration of a forward trace."""
    if policy is not None:
        policy.reset_trace()
    _POLICY_STACK.append(policy)
    try:
        yield policy
    finally:
        _POLICY_STACK.pop()


def current_policy() -> Optional[CompressionPolicy]:
    return _POLICY_STACK[-1] if _POLICY_STACK else None


def _apply_weight_hooks(module: nn.Module, kernel: jax.Array) -> jax.Array:
    policy = current_policy()
    if policy is None:
        return kernel
    return policy.process_weight(_path_of(module), kernel)


def _apply_act_hooks(module: nn.Module, act: jax.Array) -> jax.Array:
    policy = current_policy()
    if policy is None:
        return act
    return policy.process_act(_path_of(module), act)


def _apply_input_hooks(module: nn.Module, x: jax.Array) -> jax.Array:
    policy = current_policy()
    if policy is None:
        return x
    return policy.process_input(_path_of(module), x)


def _path_of(module: nn.Module) -> str:
    return '/'.join(module.path)


def relu(x: jax.Array) -> jax.Array:
    """ReLU with a post-activation interception point.

    The reference inserts activation fake-quant *after* the nonlinearity
    (uniform_quantization/utils.py:52-80: Relu/Relu6/Tanh... outputs get the
    quant node) because that is where int tensors materialize at deployment.
    Activation sites are identified by trace order ('act/<idx>'), which is
    deterministic under jit.
    """
    y = jax.nn.relu(x)
    policy = current_policy()
    if policy is not None:
        y = policy.process_act('act/%d' % policy._next_act_index(), y)
    return y


def relu6(x: jax.Array) -> jax.Array:
    y = jnp.minimum(jax.nn.relu(x), 6.0)
    policy = current_policy()
    if policy is not None:
        y = policy.process_act('act/%d' % policy._next_act_index(), y)
    return y


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

Dtype = Any


class PFConv(nn.Module):
    """2D convolution (NHWC) with weight/activation interception.

    Kernel layout HWIO; maps onto the MXU via lax.conv_general_dilated.
    """
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = 'SAME'
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    kernel_init: Callable = nn.initializers.variance_scaling(2.0, 'fan_out', 'truncated_normal')

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            'kernel', self.kernel_init,
            (*self.kernel_size, in_features, self.features), jnp.float32)
        x = _apply_input_hooks(self, x)
        kernel = _apply_weight_hooks(self, kernel)

        def conv_fn(xv, kv, acc_dtype=None):
            return jax.lax.conv_general_dilated(
                xv, kv, window_strides=self.strides, padding=self.padding,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                **({'preferred_element_type': acc_dtype} if acc_dtype else {}))

        y = None
        policy = current_policy()
        if policy is not None:
            y = policy.run_contraction(_path_of(self), x, kernel, conv_fn)
        if y is None:
            y = conv_fn(x.astype(self.dtype), kernel.astype(self.dtype))
        # named for the 'save_convs' remat policy (--remat_blocks): under
        # block remat only these conv products are stored for backward,
        # BN/ReLU recompute from them.  Gated on the flag so the jaxpr stays
        # primitive-clean for consumers like shrink_graph's capture trace.
        from pocketflow_tpu.config import FLAGS
        if (FLAGS.get('remat_blocks') or 'none') != 'none':
            y = checkpoint_name(y, 'conv_out')
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        y = _apply_act_hooks(self, y)
        return y.astype(self.dtype)


class PFDepthwiseConv(nn.Module):
    """Depthwise 2D convolution (channel multiplier 1), as in MobileNet."""
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = 'SAME'
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16
    kernel_init: Callable = nn.initializers.variance_scaling(2.0, 'fan_out', 'truncated_normal')

    @nn.compact
    def __call__(self, x):
        channels = x.shape[-1]
        # HWIO with I=1, O=channels and feature_group_count=channels.
        kernel = self.param(
            'kernel', self.kernel_init, (*self.kernel_size, 1, channels), jnp.float32)
        x = _apply_input_hooks(self, x)
        kernel = _apply_weight_hooks(self, kernel)

        def conv_fn(xv, kv, acc_dtype=None):
            return jax.lax.conv_general_dilated(
                xv, kv, window_strides=self.strides, padding=self.padding,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                feature_group_count=channels,
                **({'preferred_element_type': acc_dtype} if acc_dtype else {}))

        y = None
        policy = current_policy()
        if policy is not None:
            y = policy.run_contraction(_path_of(self), x, kernel, conv_fn)
        if y is None:
            y = conv_fn(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros, (channels,), jnp.float32)
            y = y + bias.astype(y.dtype)
        y = _apply_act_hooks(self, y)
        return y.astype(self.dtype)


class PFDense(nn.Module):
    """Dense layer with weight/activation interception."""
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        kernel = self.param('kernel', self.kernel_init,
                            (x.shape[-1], self.features), jnp.float32)
        x = _apply_input_hooks(self, x)
        kernel = _apply_weight_hooks(self, kernel)

        def dense_fn(xv, kv, acc_dtype=None):
            return jax.lax.dot_general(
                xv, kv, dimension_numbers=(((xv.ndim - 1,), (0,)), ((), ())),
                **({'preferred_element_type': acc_dtype} if acc_dtype else {}))

        y = None
        policy = current_policy()
        if policy is not None:
            y = policy.run_contraction(_path_of(self), x, kernel, dense_fn)
        if y is None:
            y = dense_fn(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        y = _apply_act_hooks(self, y)
        return y.astype(self.dtype)


class BatchNorm(nn.Module):
    """Batch normalization; running stats live in the `batch_stats` collection.

    Under pjit data parallelism the batch mean/var are global (cross-chip)
    reductions — XLA inserts the collectives — i.e. sync-BN semantics, a strict
    improvement over the reference's per-GPU BN.

    ``--bn_stats_subsample=S`` (default 1 = exact) computes the batch
    statistics from the leading 1/S contiguous slice of each data-shard
    (ghost-BN): the train step is HBM-bandwidth-bound and the stats
    reductions re-read every conv output, so subsampling removes (S-1)/S of
    that traffic in forward AND backward.  Contiguous slices keep the read
    DMA-friendly (a stride-S gather measured -37% end-to-end), and blocking
    by the data-axis size keeps the reduction balanced across chips under
    batch sharding.  Exact BN remains the default; the approximation only
    affects which samples define mu/sigma, not the normalization algebra.
    """
    use_running_average: Optional[bool] = None
    momentum: float = 0.997
    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        from pocketflow_tpu.config import FLAGS
        ura = nn.merge_param(
            'use_running_average', self.use_running_average, use_running_average)
        sub = int(FLAGS.get('bn_stats_subsample') or 1)
        if ura or sub <= 1 or x.shape[0] < 2 * sub:
            return nn.BatchNorm(
                use_running_average=ura, momentum=self.momentum,
                epsilon=self.epsilon, dtype=self.dtype,
                param_dtype=jnp.float32, name='bn')(x)
        return _GhostBatchNorm(
            momentum=self.momentum, epsilon=self.epsilon, dtype=self.dtype,
            subsample=sub, name='bn')(x)


class _GhostBatchNorm(nn.Module):
    """Train-mode BN with strided-subsample statistics (see BatchNorm)."""
    momentum: float
    epsilon: float
    dtype: Dtype
    subsample: int

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (features,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((features,), jnp.float32))
        # stats from the LEADING 1/S of each data-shard: contiguous slices
        # keep the read DMA-friendly (a stride-S gather measured -37% on the
        # whole train step), and blocking by the data-axis size keeps the
        # reduction balanced across chips under batch sharding (a single
        # global leading slice would pile the stats pass onto chip 0)
        from pocketflow_tpu.core import mesh as mesh_lib
        nb_shards = mesh_lib.num_workers()
        batch = x.shape[0]
        if nb_shards > 1 and batch % nb_shards == 0:
            local = batch // nb_shards
            xs = x.reshape((nb_shards, local) + x.shape[1:])
            xs = xs[:, :max(1, local // self.subsample)]
            xs = xs.reshape((-1,) + x.shape[1:]).astype(jnp.float32)
        else:
            xs = x[:batch // self.subsample].astype(jnp.float32)
        axes = tuple(range(xs.ndim - 1))
        mean = jnp.mean(xs, axis=axes)
        var = jnp.mean(jnp.square(xs), axis=axes) - jnp.square(mean)
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * var)
        inv = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(self.dtype)
        shift = (bias - mean * jax.lax.rsqrt(var + self.epsilon)
                 * scale).astype(self.dtype)
        return x.astype(self.dtype) * inv + shift


def max_pool(x, window: Tuple[int, int] = (2, 2), strides: Optional[Tuple[int, int]] = None,
             padding: str = 'VALID'):
    strides = strides or window
    return nn.max_pool(x, window_shape=window, strides=strides, padding=padding)


def avg_pool(x, window: Tuple[int, int] = (2, 2), strides: Optional[Tuple[int, int]] = None,
             padding: str = 'VALID'):
    strides = strides or window
    return nn.avg_pool(x, window_shape=window, strides=strides, padding=padding)


def global_avg_pool(x):
    return jnp.mean(x, axis=(1, 2))


def maybe_remat(block_cls):
    """Wrap a block module class per ``--remat_blocks`` (none | save_convs |
    full).

    'save_convs' stores only the named conv products for backward and
    recomputes BN/ReLU chains from them (jax.checkpoint_policies
    save_only_these_names('conv_out')); 'full' stores block inputs only.
    Both trade recompute for activation HBM traffic/footprint — a MEMORY
    knob on v5e (measured slower for throughput, experiments/step_remat.py);
    jax.checkpoint is the TPU-native form of gradient checkpointing (no
    reference counterpart).  Gradients are bit-identical across modes
    (test-locked).  Blocks must have signature __call__(self, x, train).
    """
    from pocketflow_tpu.config import FLAGS
    mode = FLAGS.get('remat_blocks') or 'none'
    if mode == 'none':
        return block_cls
    policy = None
    if mode == 'save_convs':
        policy = jax.checkpoint_policies.save_only_these_names('conv_out')
    elif mode != 'full':
        raise ValueError('unknown remat_blocks mode %r' % mode)
    # static_argnums indexes the __call__ args with self at 0: train is 2
    return nn.remat(block_cls, policy=policy, static_argnums=(2,))
