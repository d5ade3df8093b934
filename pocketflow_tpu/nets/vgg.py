"""VGG-16 backbone + SSD-300 head modules (NHWC / bf16 / PF layers).

Rebuild of the SSD-VGG network the reference vendors under
/root/reference/utils/external/ssd_tensorflow/ (wrapped by
nets/vgg_at_pascalvoc.py).  Structure: VGG-16 through conv5_3, dilated
conv6/conv7 (the fc-to-conv conversion), extra stride-2 feature blocks, and
per-scale 3x3 heads emitting class logits + box deltas for every anchor.

The module adapts to the input size: extra blocks stack until the spatial
size reaches 1 (6 scales at 300x300, matching SSD-300; fewer on the tiny
test inputs).  Every conv is a PFConv, so all compression policies
(quantization, sparsification, channel pruning) apply to detection models
unchanged.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from flax import linen as nn_linen

from pocketflow_tpu.nn import PFConv, max_pool, relu

VGG_STAGES = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))

# VGG has no normalization layers: He fan-out init compounds activation
# growth over 13+ relu convs, so use Xavier for the trunk and the SSD
# convention (normal 0.01) for the multibox heads to keep initial logits tame
_XAVIER = nn_linen.initializers.variance_scaling(1.0, 'fan_avg', 'uniform')
_HEAD_INIT = nn_linen.initializers.normal(0.01)


class VGGBackbone(nn.Module):
    """VGG-16 feature extractor; returns [conv4_3, conv7] features."""
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feats = []
        for stage, (nb_convs, width) in enumerate(VGG_STAGES, start=1):
            for idx in range(nb_convs):
                x = PFConv(width, (3, 3), dtype=self.dtype, kernel_init=_XAVIER,
                           name='conv%d_%d' % (stage, idx + 1))(x)
                x = relu(x)
            if stage == 4:
                feats.append(x)  # conv4_3 (before pool)
            if stage < 5:
                x = max_pool(x, (2, 2), (2, 2), padding='SAME')
            else:
                x = max_pool(x, (3, 3), (1, 1), padding='SAME')
        # dilated conv6 + conv7 (fc6/fc7 conversions)
        x = PFConv(1024, (3, 3), dtype=self.dtype, kernel_init=_XAVIER,
                   name='conv6')(x)
        x = relu(x)
        x = PFConv(1024, (1, 1), dtype=self.dtype, kernel_init=_XAVIER,
                   name='conv7')(x)
        x = relu(x)
        feats.append(x)
        return feats


class L2Norm(nn.Module):
    """Channel-wise L2 normalization with a learned scale (SSD's conv4_3
    norm layer — VGG has no BN, so the conv4_3 feature magnitudes must be
    tamed or training diverges; scale init 20 per the SSD paper)."""
    init_scale: float = 20.0

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', nn.initializers.constant(self.init_scale),
                           (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(x32), axis=-1, keepdims=True) + 1e-10)
        return (x32 / norm * scale).astype(x.dtype)


class SSDVGG(nn.Module):
    """SSD detector: backbone + extra scales + multibox heads.

    Returns (cls_logits [B, A, nb_classes], box_deltas [B, A, 4]).
    """
    nb_classes: int = 21
    nb_anchors_per_cell: int = 4
    max_extra_blocks: int = 4
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = VGGBackbone(dtype=self.dtype, name='vgg')(x)
        feats[0] = L2Norm(name='l2norm_conv4_3')(feats[0])
        y = feats[-1]
        for idx in range(self.max_extra_blocks):
            if y.shape[1] <= 1:
                break
            width = 256 if idx == 0 else 128
            y = PFConv(width, (1, 1), dtype=self.dtype, kernel_init=_XAVIER,
                       name='conv%d_1' % (8 + idx))(y)
            y = relu(y)
            y = PFConv(width * 2, (3, 3), (2, 2), dtype=self.dtype,
                       kernel_init=_XAVIER, name='conv%d_2' % (8 + idx))(y)
            y = relu(y)
            feats.append(y)

        cls_outs, box_outs = [], []
        k = self.nb_anchors_per_cell
        for idx, feat in enumerate(feats):
            cls = PFConv(k * self.nb_classes, (3, 3), dtype=self.dtype,
                         kernel_init=_HEAD_INIT, name='cls_head_%d' % idx)(feat)
            box = PFConv(k * 4, (3, 3), dtype=self.dtype,
                         kernel_init=_HEAD_INIT, name='box_head_%d' % idx)(feat)
            b = feat.shape[0]
            cls_outs.append(cls.reshape(b, -1, self.nb_classes))
            box_outs.append(box.reshape(b, -1, 4))
        return (jnp.concatenate(cls_outs, axis=1).astype(jnp.float32),
                jnp.concatenate(box_outs, axis=1).astype(jnp.float32))

    @staticmethod
    def feature_sizes(image_size: int, max_extra_blocks: int = 4) -> List[int]:
        """Spatial sizes of the SSD feature maps for a square input."""
        s = image_size
        for _ in range(3):  # pools after stages 1-3
            s = -(-s // 2)
        conv4 = s
        s = -(-s // 2)      # pool after stage 4 -> conv7 size
        sizes = [conv4, s]
        for _ in range(max_extra_blocks):
            if s <= 1:
                break
            s = -(-s // 2)
            sizes.append(s)
        return sizes
