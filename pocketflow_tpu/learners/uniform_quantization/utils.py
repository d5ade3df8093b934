"""Quantization policy + quant-site discovery for the uniform-quant learner.

Rebuild of /root/reference/learners/uniform_quantization/utils.py:38-199.  The
reference walks the frozen TF graph for MatMul/Conv2D ops and activations and
splices fake-quant subgraphs in via `tf.contrib.graph_editor`; here the same
interception happens at trace time through a `CompressionPolicy`: every
PFConv/PFDense kernel passes through ``process_weight`` and every relu output
through ``process_act``, so "graph surgery" reduces to a dict lookup + a fused
Pallas fake-quant kernel call (ops/fake_quant.py) with STE gradients.

Per-layer bit-widths are *traced* arrays living in ``TrainState.extra`` — the
analogue of the reference's ``tf.placeholder`` bit lists (learner.py:330-336),
so changing bits never triggers a recompile.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.nn.layers import CompressionPolicy, compression
from pocketflow_tpu.ops import fake_quant as fq

FLAGS.DEFINE_integer('uql_weight_bits', 4, 'UQL: # of bits for weight quantization')
FLAGS.DEFINE_integer('uql_activation_bits', 32, 'UQL: # of bits for activation quantization')
FLAGS.DEFINE_boolean('uql_use_buckets', False, 'UQL: use bucketing or not')
FLAGS.DEFINE_integer('uql_bucket_size', 256, 'UQL: bucket size')
FLAGS.DEFINE_integer('uql_quant_epochs', 60, 'UQL: # of finetune epochs')
FLAGS.DEFINE_string('uql_save_quant_model_path',
                    './uql_quant_models/uql_quant_model.ckpt',
                    'UQL: quantized model save path')
FLAGS.DEFINE_boolean('uql_quantize_all_layers', False,
                     'UQL: if False, leave first and last layers unquantized')
FLAGS.DEFINE_string('uql_bucket_type', 'channel', "UQL: bucket type ('channel' | 'split')")


class _SiteRecorder(CompressionPolicy):
    """Records weight paths (trace order) and counts activation sites."""

    def __init__(self):
        self.weight_paths: List[str] = []
        self.weight_shapes: List[Tuple[int, ...]] = []
        self.nb_acts = 0

    def reset_trace(self):
        super().reset_trace()
        self.weight_paths, self.weight_shapes, self.nb_acts = [], [], 0

    def process_weight(self, path, kernel):
        self.weight_paths.append(path)
        self.weight_shapes.append(tuple(kernel.shape))
        return kernel

    def process_act(self, path, act):
        if path.startswith('act/'):
            self.nb_acts += 1
        return act


def discover_quant_sites(model, variables, sample_images) -> Dict[str, Any]:
    """One abstract trace (no FLOPs) to find matmul/conv weights in *graph
    order* and count activation sites (reference search_matmul_op /
    search_activation_op, utils.py:115-137)."""
    recorder = _SiteRecorder()

    def fwd(v, x):
        with compression(recorder):
            model.apply(v, x, train=False)
        return ()

    jax.eval_shape(fwd, variables, jax.ShapeDtypeStruct(sample_images.shape, jnp.float32))
    paths = list(recorder.weight_paths)
    shapes = list(recorder.weight_shapes)
    if not FLAGS.uql_quantize_all_layers and len(paths) > 2:
        paths, shapes = paths[1:-1], shapes[1:-1]  # utils.py:122-123
    return {
        'weight_paths': paths,
        'weight_shapes': shapes,
        'num_weights': [int(np.prod(s)) for s in shapes],
        'nb_matmuls': len(paths),
        'nb_activations': recorder.nb_acts,
    }


class QuantPolicy(CompressionPolicy):
    """Fake-quantizes selected kernels + activations at traced bit-widths.

    ``quant_acts`` statically disables activation quantization when every
    activation runs at >= 32 bits (the reference only inserts activation
    quant ops when act bits < 32) — otherwise each relu would pay a full
    min/max+round pass whose result the `where` discards.
    """

    def __init__(self, weight_paths: List[str], w_bits: jax.Array, a_bits: jax.Array,
                 quant_acts: bool = None):
        self.w_index = {p: i for i, p in enumerate(weight_paths)}
        self.w_bits = w_bits
        self.a_bits = a_bits
        self.quant_acts = (FLAGS.uql_activation_bits < 32
                           if quant_acts is None else quant_acts)

    def process_weight(self, path, kernel):
        idx = self.w_index.get(path)
        if idx is None:
            return kernel
        bits = self.w_bits[idx]
        if FLAGS.uql_use_buckets:
            if FLAGS.uql_bucket_type == 'channel':
                q = fq.fake_quant_channel_bucket(kernel, bits)
            elif FLAGS.uql_bucket_type == 'split':
                q = fq.fake_quant_split_bucket(kernel, bits, FLAGS.uql_bucket_size)
            else:
                raise ValueError('unrecognized bucket type: ' + FLAGS.uql_bucket_type)
        else:
            q = fq.fake_quant(kernel, bits)
        # bits >= 32 means full precision (reference feeds 32 to disable)
        return jnp.where(bits < 32, q, kernel)

    def process_act(self, path, act):
        if not path.startswith('act/') or not self.quant_acts:
            return act
        if self.a_bits.shape[0] == 0:
            return act
        idx = int(path.split('/')[1])  # trace-order site id assigned by relu()
        bits = self.a_bits[idx]
        return jnp.where(bits < 32, fq.fake_quant(act, bits).astype(act.dtype), act)


def bits_state(statistics: Dict[str, Any],
               w_bit_list=None, a_bit_list=None) -> Dict[str, jax.Array]:
    """extra-state pytree holding the per-layer bit lists."""
    w = w_bit_list if w_bit_list is not None \
        else [FLAGS.uql_weight_bits] * statistics['nb_matmuls']
    a = a_bit_list if a_bit_list is not None \
        else [FLAGS.uql_activation_bits] * statistics['nb_activations']
    return {'w_bits': jnp.asarray(w, jnp.float32),
            'a_bits': jnp.asarray(np.asarray(a) if len(a) else np.zeros(0), jnp.float32)}


def bucket_storage_bits(statistics: Dict[str, Any]) -> int:
    """Total scale-factor overhead in bits (reference utils.py:297-306)."""
    if not FLAGS.uql_use_buckets:
        return 0
    total = 0
    for shape in statistics['weight_shapes']:
        total += fq.bucket_storage_bits(shape, FLAGS.uql_bucket_type, FLAGS.uql_bucket_size)
    return total
