"""Channel-pruned physical-shrink serving latency on the TPU chip.

The reference's channel-pruning value proposition is mobile latency from
physically smaller convs (docs/performance.md tables).  This measures the
TPU equivalent: a 50%-channel-pruned ResNet-50, residual-aware shrunk via
tools/shrink_graph + served through the width_map zoo models.

Measured 2026-08-16 (v5e chip, bs 64, bf16):
    params 25.6M -> 6.9M;  latency 6.56 ms -> 3.51 ms  (**1.87x**)
    logits max delta vs dense-with-zeros: 7e-4 (bf16 noise)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import pocketflow_tpu
from pocketflow_tpu.config import FLAGS
FLAGS.override(synthetic_data=True, compute_dtype='bfloat16', batch_size=64,
               batch_size_eval=64)
from pocketflow_tpu.nets.resnet import ResNetImageNet
from pocketflow_tpu.tools import shrink_graph as sg

model = ResNetImageNet(resnet_size=50, nb_classes=1001, dtype=jnp.bfloat16)
x = jnp.zeros((64, 224, 224, 3), jnp.bfloat16)
variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
params = jax.device_get(variables['params'])
stats = jax.device_get(variables['batch_stats'])

def zero_half(node):
    for k, child in node.items():
        if isinstance(child, dict):
            if 'kernel' in child:
                arr = np.array(child['kernel'])
                if arr.ndim == 4 and arr.shape[2] > 3:
                    arr[:, :, :arr.shape[2]//2, :] = 0.0
                elif arr.ndim == 2:
                    arr[:arr.shape[0]//2, :] = 0.0
                child['kernel'] = arr
            else:
                zero_half(child)
zero_half(params)

graph = sg.capture_conv_graph(model, {'params': params, 'batch_stats': stats}, x.shape)
packed, manifest = sg.shrink_residual_aware(params, stats, graph)
wm = sg.width_map_from_packed(packed)
small = ResNetImageNet(resnet_size=50, nb_classes=1001, dtype=jnp.bfloat16, width_map=wm)
small_vars = jax.device_put(sg.variables_from_packed(packed))
dense_vars = jax.device_put({'params': params, 'batch_stats': stats})

def timed(fn, *args, n=30):
    out = fn(*args); jax.block_until_ready(out)
    float(jax.device_get(jnp.sum(out[:2, :2].astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    float(jax.device_get(jnp.sum(out[:2, :2].astype(jnp.float32))))
    return (time.perf_counter() - t0) / n * 1e3

f_dense = jax.jit(lambda v, im: model.apply(v, im, train=False))
f_small = jax.jit(lambda v, im: small.apply(v, im, train=False))
img = jax.device_put(jax.random.normal(jax.random.PRNGKey(1), x.shape, jnp.bfloat16))
a = f_dense(dense_vars, img); b = f_small(small_vars, img)
err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
print('logits max delta (bf16):', err)
td = timed(f_dense, dense_vars, img)
ts = timed(f_small, small_vars, img)
nb_small = sum(int(np.prod(np.shape(l))) for l in jax.tree_util.tree_leaves(small_vars['params']))
nb_dense = sum(int(np.prod(np.shape(l))) for l in jax.tree_util.tree_leaves(params))
print('params: %.1fM -> %.1fM' % (nb_dense/1e6, nb_small/1e6))
print('latency bs64: dense %.2f ms  shrunk %.2f ms  speedup %.2fx' % (td, ts, td/ts))
