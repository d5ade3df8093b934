"""TFLite 32-bit vs 8-bit latency on real backbones (host-CPU analogue of the
reference's phone table, docs/performance.md:41-48: MobileNet-v1 2.2-2.5x,
MobileNet-v2 2.5-3.7x speedup from int8).

Converts MobileNet-v1/v2 (+ optionally ResNet-18) @ 224 to float and
full-int8 TFLite via pocketflow_tpu.tools.export_tflite and times both with
the interpreter (100 warmup + 100 timed, reference calc_inference_time.py
protocol, single thread = one phone big core).

Run: python experiments/tflite_latency.py [model ...]
Measured 2026-08-16 (1-core container host, XNNPACK, single thread):
    mobilenet_v1: fp32 9.53 ms -> int8 3.50 ms (2.72x), blob 16.9->4.5 MB
    mobilenet_v2: fp32 12.82 ms -> int8 9.18 ms (1.40x), blob 13.9->3.9 MB
(reference phone numbers: v1 2.22-2.50x, v2 2.46-3.69x; x86 XNNPACK's fp32
v2 path is already heavily optimized, hence the smaller int8 win there)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def build(name):
    from pocketflow_tpu.nets.mobilenet import MobileNetV1, MobileNetV2
    from pocketflow_tpu.nets.resnet import ResNetImageNet
    import jax.numpy as jnp
    if name == 'mobilenet_v1':
        model = MobileNetV1(nb_classes=1000, dtype=jnp.float32)
    elif name == 'mobilenet_v2':
        model = MobileNetV2(nb_classes=1000, dtype=jnp.float32)
    elif name == 'resnet_18':
        model = ResNetImageNet(resnet_size=18, nb_classes=1000,
                               dtype=jnp.float32)
    else:
        raise ValueError(name)
    x = np.random.default_rng(0).random((1, 224, 224, 3)).astype(np.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x,
                                           train=False))()
    return model, variables, x


def main(models):
    from pocketflow_tpu.tools import export_tflite as tfl
    results = {}
    for name in models:
        model, variables, x = build(name)
        blob_f = tfl.convert_to_tflite(model, variables, x, quantize='none')
        blob_q = tfl.convert_to_tflite(model, variables, x, quantize='int8',
                                       input_uint8=True)
        lat_f = tfl.measure_latency(blob_f)
        lat_q = tfl.measure_latency(blob_q)
        results[name] = {
            'fp32_ms': round(lat_f['mean_ms'], 2),
            'int8_ms': round(lat_q['mean_ms'], 2),
            'speedup': round(lat_f['mean_ms'] / lat_q['mean_ms'], 2),
            'fp32_bytes': len(blob_f), 'int8_bytes': len(blob_q),
        }
        print(name, json.dumps(results[name]), flush=True)
    return results


if __name__ == '__main__':
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    jax.config.update('jax_platforms', 'cpu')
    main(sys.argv[1:] or ['mobilenet_v1', 'mobilenet_v2'])
