"""MobileNet-v1/v2 modules, NHWC / bf16-compute / MXU-friendly.

Covers the backbones the reference vendors from slim
(/root/reference/utils/external/mobilenet_v1.py and mobilenet/mobilenet_v2.py,
wrapped by /root/reference/nets/mobilenet_at_ilsvrc12.py:40-67).  Built from
PFDepthwiseConv/PFConv so every conv participates in compression policies.

Naming convention matters for the compression learners: pointwise 1x1 convs
are named ``pw``/``pw_expand``/``pw_project`` and the classifier ``logits`` —
the weight-sparsification regression targets and the channel pruners match on
these substrings (reference pr_optimizer.py:292-296 matches
'pointwise/Conv2D' and 'Conv2d_1c_1x1').  Depthwise convs are named ``dw``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pocketflow_tpu.nn import BatchNorm, PFConv, PFDepthwiseConv, global_avg_pool
from pocketflow_tpu.nn.layers import PFDense, maybe_remat, relu6
from pocketflow_tpu.nets.resnet import _w


def _depth(channels: int, multiplier: float, divisor: int = 8, min_depth: int = 8) -> int:
    """slim's depth-multiplier rounding (multiple of 8, >= min_depth)."""
    channels = channels * multiplier
    new_c = max(min_depth, int(channels + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * channels:  # do not round down by more than 10%
        new_c += divisor
    return int(new_c)


class SeparableBlock(nn.Module):
    """MobileNet-v1 block: 3x3 depthwise + BN + relu6, 1x1 pointwise + BN + relu6."""
    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: object = jnp.bfloat16
    width_map: Optional[Dict[str, int]] = None  # shrunk-serving overrides

    @nn.compact
    def __call__(self, x, train: bool):
        x = PFDepthwiseConv((3, 3), self.strides, dtype=self.dtype, name='dw')(x)
        x = BatchNorm(dtype=self.dtype, name='bn_dw')(x, use_running_average=not train)
        x = relu6(x)
        x = PFConv(_w(self, 'pw', self.features), (1, 1), use_bias=False,
                   dtype=self.dtype, name='pw')(x)
        x = BatchNorm(dtype=self.dtype, name='bn_pw')(x, use_running_average=not train)
        return relu6(x)


# (features, stride) per block — MobileNet-v1 body
V1_BLOCKS = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
             (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),
             (1024, 2), (1024, 1)]


class MobileNetV1(nn.Module):
    nb_classes: int = 1001
    depth_mult: float = 1.0
    dtype: object = jnp.bfloat16
    width_map: Optional[Dict[str, int]] = None  # shrunk-serving overrides

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = lambda c: _depth(c, self.depth_mult)
        x = PFConv(_w(self, 'conv_init', d(32)), (3, 3), (2, 2),
                   use_bias=False, dtype=self.dtype, name='conv_init')(x)
        x = BatchNorm(dtype=self.dtype, name='bn_init')(x, use_running_average=not train)
        x = relu6(x)
        block_cls = maybe_remat(SeparableBlock)
        for idx, (features, stride) in enumerate(V1_BLOCKS):
            x = block_cls(d(features), (stride, stride), self.dtype,
                          self.width_map,
                          name='block%02d' % (idx + 1))(x, train)
        x = global_avg_pool(x)
        # slim uses a 1x1 conv classifier ('Conv2d_1c_1x1'); a dense layer on
        # the pooled vector is the same matmul
        x = PFDense(self.nb_classes, dtype=self.dtype, name='logits')(x)
        return x.astype(jnp.float32)


class InvertedResidual(nn.Module):
    """MobileNet-v2 block: 1x1 expand + 3x3 depthwise + 1x1 linear project."""
    features: int
    strides: Tuple[int, int] = (1, 1)
    expand_ratio: int = 6
    dtype: object = jnp.bfloat16
    width_map: Optional[Dict[str, int]] = None  # shrunk-serving overrides

    @nn.compact
    def __call__(self, x, train: bool):
        in_features = x.shape[-1]
        y = x
        if self.expand_ratio != 1:
            y = PFConv(_w(self, 'pw_expand', in_features * self.expand_ratio),
                       (1, 1), use_bias=False,
                       dtype=self.dtype, name='pw_expand')(y)
            y = BatchNorm(dtype=self.dtype, name='bn_expand')(y, use_running_average=not train)
            y = relu6(y)
        y = PFDepthwiseConv((3, 3), self.strides, dtype=self.dtype, name='dw')(y)
        y = BatchNorm(dtype=self.dtype, name='bn_dw')(y, use_running_average=not train)
        y = relu6(y)
        y = PFConv(_w(self, 'pw_project', self.features), (1, 1),
                   use_bias=False, dtype=self.dtype,
                   name='pw_project')(y)  # linear bottleneck: no activation
        y = BatchNorm(dtype=self.dtype, name='bn_project')(y, use_running_average=not train)
        if self.strides == (1, 1) and in_features == self.features:
            y = y + x
        return y


# (expand_ratio, features, repeats, first_stride) — MobileNet-v2 body
V2_BLOCKS = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
             (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]


class MobileNetV2(nn.Module):
    nb_classes: int = 1001
    depth_mult: float = 1.0
    dtype: object = jnp.bfloat16
    width_map: Optional[Dict[str, int]] = None  # shrunk-serving overrides

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = lambda c: _depth(c, self.depth_mult)
        x = PFConv(_w(self, 'conv_init', d(32)), (3, 3), (2, 2),
                   use_bias=False, dtype=self.dtype, name='conv_init')(x)
        x = BatchNorm(dtype=self.dtype, name='bn_init')(x, use_running_average=not train)
        x = relu6(x)
        idx = 0
        block_cls = maybe_remat(InvertedResidual)
        for expand, features, repeats, first_stride in V2_BLOCKS:
            for rep in range(repeats):
                stride = first_stride if rep == 0 else 1
                x = block_cls(d(features), (stride, stride), expand,
                              self.dtype, self.width_map,
                              name='block%02d' % idx)(x, train)
                idx += 1
        # head conv: 1280 (not scaled down below 1280 for mult <= 1)
        head = _depth(1280, max(1.0, self.depth_mult))
        x = PFConv(_w(self, 'pw_head', head), (1, 1), use_bias=False,
                   dtype=self.dtype, name='pw_head')(x)
        x = BatchNorm(dtype=self.dtype, name='bn_head')(x, use_running_average=not train)
        x = relu6(x)
        x = global_avg_pool(x)
        x = PFDense(self.nb_classes, dtype=self.dtype, name='logits')(x)
        return x.astype(jnp.float32)
