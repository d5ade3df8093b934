"""ResNet modules (basic + bottleneck), NHWC / bf16-compute / MXU-friendly.

Covers the backbones the reference wraps from `utils/external/resnet_model.py`
(official TF ResNet): ResNet-20/32/44/56 for CIFAR-10 and ResNet-18/34/50 for
ILSVRC-12 (block-size table at /root/reference/nets/resnet_at_ilsvrc12.py:36-58).
Built from PFConv/BatchNorm so every conv participates in compression policies.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pocketflow_tpu.nn import BatchNorm, PFConv, global_avg_pool, max_pool, relu
from pocketflow_tpu.nn.layers import PFDense, maybe_remat


def _w(module: nn.Module, child: str, default: int) -> int:
    """Per-layer width override for physically-shrunk serving models.

    ``width_map`` maps module paths (e.g. 'stage1_block0/conv1') to output
    channel counts, as produced by tools/shrink_graph.width_map_from_packed —
    the rebuild of the reference export's "alt routines" that rebuild the
    graph with smaller convs (export_chn_pruned_tflite_model.py:223-277).
    """
    wm = getattr(module, 'width_map', None)
    if not wm:
        return default
    return int(wm.get('/'.join(tuple(module.path) + (child,)), default))


class BasicBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: object = jnp.bfloat16
    width_map: Optional[Dict[str, int]] = None

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        y = PFConv(_w(self, 'conv1', self.features), (3, 3), self.strides,
                   use_bias=False, dtype=self.dtype, name='conv1')(x)
        y = BatchNorm(dtype=self.dtype, name='bn1')(y, use_running_average=not train)
        y = relu(y)
        out_w = _w(self, 'conv2', self.features)
        y = PFConv(out_w, (3, 3), use_bias=False, dtype=self.dtype, name='conv2')(y)
        y = BatchNorm(dtype=self.dtype, name='bn2')(y, use_running_average=not train)
        if shortcut.shape != y.shape:
            shortcut = PFConv(_w(self, 'conv_sc', out_w), (1, 1), self.strides,
                              use_bias=False, dtype=self.dtype, name='conv_sc')(shortcut)
            shortcut = BatchNorm(dtype=self.dtype, name='bn_sc')(
                shortcut, use_running_average=not train)
        return relu(y + shortcut)


class BottleneckBlock(nn.Module):
    features: int  # bottleneck width; output = 4x
    strides: Tuple[int, int] = (1, 1)
    dtype: object = jnp.bfloat16
    width_map: Optional[Dict[str, int]] = None

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        y = PFConv(_w(self, 'conv1', self.features), (1, 1), use_bias=False,
                   dtype=self.dtype, name='conv1')(x)
        y = BatchNorm(dtype=self.dtype, name='bn1')(y, use_running_average=not train)
        y = relu(y)
        y = PFConv(_w(self, 'conv2', self.features), (3, 3), self.strides,
                   use_bias=False, dtype=self.dtype, name='conv2')(y)
        y = BatchNorm(dtype=self.dtype, name='bn2')(y, use_running_average=not train)
        y = relu(y)
        out_w = _w(self, 'conv3', 4 * self.features)
        y = PFConv(out_w, (1, 1), use_bias=False, dtype=self.dtype, name='conv3')(y)
        y = BatchNorm(dtype=self.dtype, name='bn3')(y, use_running_average=not train)
        if shortcut.shape != y.shape:
            shortcut = PFConv(_w(self, 'conv_sc', out_w), (1, 1), self.strides,
                              use_bias=False, dtype=self.dtype, name='conv_sc')(shortcut)
            shortcut = BatchNorm(dtype=self.dtype, name='bn_sc')(
                shortcut, use_running_average=not train)
        return relu(y + shortcut)


class ResNetCifar(nn.Module):
    """ResNet-(6n+2) for CIFAR: 3 stages x n blocks, widths 16/32/64."""
    nb_blocks: int  # n = (size - 2) / 6
    nb_classes: int = 10
    dtype: object = jnp.bfloat16
    width_map: Optional[Dict[str, int]] = None  # shrunk-serving overrides

    @nn.compact
    def __call__(self, x, train: bool = True):
        block_cls = maybe_remat(BasicBlock)
        x = PFConv(_w(self, 'conv_init', 16), (3, 3), use_bias=False,
                   dtype=self.dtype, name='conv_init')(x)
        x = BatchNorm(dtype=self.dtype, name='bn_init')(x, use_running_average=not train)
        x = relu(x)
        for stage, width in enumerate((16, 32, 64)):
            for block in range(self.nb_blocks):
                strides = (2, 2) if (stage > 0 and block == 0) else (1, 1)
                x = block_cls(width, strides, self.dtype, self.width_map,
                              name='stage%d_block%d' % (stage + 1, block))(x, train)
        x = global_avg_pool(x)
        x = PFDense(self.nb_classes, dtype=self.dtype, name='fc')(x)
        return x.astype(jnp.float32)


# block-size table (reference resnet_at_ilsvrc12.py:36-58)
IMAGENET_CONFIGS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (BottleneckBlock, (3, 4, 6, 3)),
    101: (BottleneckBlock, (3, 4, 23, 3)),
    152: (BottleneckBlock, (3, 8, 36, 3)),
}


def space_to_depth(x, block: int = 2):
    """NHWC space-to-depth: [B, H, W, C] -> [B, H/b, W/b, C*b*b]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // block, w // block, c * block * block)


class ResNetImageNet(nn.Module):
    """ResNet-v1 for ILSVRC-12 (7x7 stem, 4 stages).

    ``stem_space_to_depth`` replaces the 7x7/s2 stem conv on 3 channels with
    a 4x4/s1 conv on the 2x2 space-to-depth input (12 channels) — the MLPerf
    ResNet trick: a C=3 conv wastes most of the MXU's 8-lane input tile,
    while the folded conv runs dense. Same output geometry (112x112x64), a
    slightly larger (superset) parameterization; enable when training from
    scratch on TPU.
    """
    resnet_size: int = 50
    nb_classes: int = 1001
    dtype: object = jnp.bfloat16
    stem_space_to_depth: bool = False
    width_map: Optional[Dict[str, int]] = None  # shrunk-serving overrides

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = imagenet_trunk(self, x, train)[-1]
        x = global_avg_pool(x)
        x = PFDense(self.nb_classes, dtype=self.dtype, name='fc')(x)
        return x.astype(jnp.float32)


def imagenet_trunk(mdl: nn.Module, x, train: bool,
                   nb_stages: Optional[int] = None):
    """ImageNet stem + residual stages, shared by ResNetImageNet and the
    Faster-RCNN backbone (nets/faster_rcnn_at_pascalvoc.ResNetBackbone).

    ONE copy keeps the module names identical across the two, which is what
    lets a classification checkpoint graft into the detector through
    ModelHelper.warm_start — and carries the width_map / stem_space_to_depth
    features everywhere the trunk is used.  Must be called from inside an
    ``nn.compact`` __call__ of `mdl` (submodules are created in its scope).
    Returns the list of per-stage feature maps (stage i has stride 2^(i+2)).
    """
    block_cls, stage_sizes = IMAGENET_CONFIGS[mdl.resnet_size]
    block_cls = maybe_remat(block_cls)
    width_map = getattr(mdl, 'width_map', None)
    if getattr(mdl, 'stem_space_to_depth', False):
        x = space_to_depth(x.astype(mdl.dtype), 2)
        x = PFConv(_w(mdl, 'conv_init', 64), (4, 4), (1, 1),
                   use_bias=False, dtype=mdl.dtype, name='conv_init')(x)
    else:
        x = PFConv(_w(mdl, 'conv_init', 64), (7, 7), (2, 2),
                   use_bias=False, dtype=mdl.dtype, name='conv_init')(x)
    x = BatchNorm(dtype=mdl.dtype, name='bn_init')(x, use_running_average=not train)
    x = relu(x)
    x = max_pool(x, (3, 3), (2, 2), padding='SAME')
    feats = []
    for stage, nb_blocks in enumerate(stage_sizes[:nb_stages]):
        width = 64 * (2 ** stage)
        for block in range(nb_blocks):
            strides = (2, 2) if (stage > 0 and block == 0) else (1, 1)
            x = block_cls(width, strides, mdl.dtype, width_map,
                          name='stage%d_block%d' % (stage + 1, block))(x, train)
        feats.append(x)
    return feats
