"""Codebook-quantization policy for the non-uniform quant learner.

Rebuild of /root/reference/learners/nonuniform_quantization/utils.py:33-487.
Weights snap to per-layer *learned* codebooks (ops/nonuniform_quant.py, exact
cluster gradients + STE); activations use the uniform min/max fake-quant
kernel, as in the reference.  Codebooks are ordinary leaves in
``TrainState.extra['codebooks']`` — the reference's
`tf.get_variable('clusters', validate_shape=False)` dance disappears.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.nn.layers import CompressionPolicy
from pocketflow_tpu.ops import fake_quant as fq
from pocketflow_tpu.ops import nonuniform_quant as nuq

FLAGS.DEFINE_string('nuql_init_style', 'kmeans',
                    "NUQL: codebook init ('kmeans' = quantile + Lloyd "
                    "refinement, the default — strictly better tail coverage "
                    "| 'quantile' (reference parity) | 'uniform')")
FLAGS.DEFINE_string('nuql_opt_mode', 'weights',
                    "NUQL: trainable set ('weights' | 'cluster' | 'both')")
FLAGS.DEFINE_integer('nuql_weight_bits', 4, 'NUQL: weight quantization bits')
FLAGS.DEFINE_integer('nuql_activation_bits', 32, 'NUQL: activation quantization bits')
FLAGS.DEFINE_boolean('nuql_use_buckets', False, 'NUQL: use bucketing or not')
FLAGS.DEFINE_integer('nuql_bucket_size', 256, 'NUQL: bucket size')
FLAGS.DEFINE_integer('nuql_quant_epochs', 60, 'NUQL: # of finetune epochs')
FLAGS.DEFINE_string('nuql_save_quant_model_path',
                    './nuql_quant_models/model.ckpt', 'NUQL: quantized model save path')
FLAGS.DEFINE_boolean('nuql_quantize_all_layers', False,
                     'NUQL: if False, leave first and last layers unquantized')
FLAGS.DEFINE_string('nuql_bucket_type', 'split', "NUQL: bucket type ('split' | 'channel')")
# RL bit-search knobs (mirror of uniform_quantization/bit_optimizer.py flags)
FLAGS.DEFINE_integer('nuql_equivalent_bits', 4, 'NUQL: bit budget equivalent bits')
FLAGS.DEFINE_integer('nuql_nb_rlouts', 200, 'NUQL: # of RL roll-outs')
FLAGS.DEFINE_integer('nuql_w_bit_min', 2, 'NUQL: minimum weight bits')
FLAGS.DEFINE_integer('nuql_w_bit_max', 8, 'NUQL: maximum weight bits')
FLAGS.DEFINE_integer('nuql_tune_layerwise_steps', 100, 'NUQL: layerwise finetune steps')
FLAGS.DEFINE_integer('nuql_tune_global_steps', 2101, 'NUQL: global finetune steps')
FLAGS.DEFINE_string('nuql_tune_save_path', './rl_tune_models/model.ckpt',
                    'NUQL: RL finetune save path')
FLAGS.DEFINE_integer('nuql_tune_disp_steps', 300, 'NUQL: finetune display interval')
FLAGS.DEFINE_boolean('nuql_enbl_random_layers', True, 'NUQL: shuffle layer order per roll-out')
FLAGS.DEFINE_boolean('nuql_enbl_rl_agent', False, 'NUQL: enable RL bit search')
FLAGS.DEFINE_boolean('nuql_enbl_rl_global_tune', True, 'NUQL: global finetune in roll-outs')
FLAGS.DEFINE_boolean('nuql_enbl_rl_layerwise_tune', False, 'NUQL: layerwise finetune in roll-outs')


def bucket_spec():
    bucket_type = FLAGS.nuql_bucket_type if FLAGS.nuql_use_buckets else None
    return bucket_type, FLAGS.nuql_bucket_size


class NonUniformQuantPolicy(CompressionPolicy):
    """Snaps selected kernels to their learned codebooks; uniform-quantizes
    activations at traced bits."""

    def __init__(self, codebooks: Dict[str, jax.Array], a_bits: jax.Array):
        self.codebooks = codebooks
        self.a_bits = a_bits

    def process_weight(self, path, kernel):
        c = self.codebooks.get(path)
        if c is None:
            return kernel
        bucket_type, bucket_size = bucket_spec()
        return nuq.nonuniform_quant(kernel, c, bucket_type, bucket_size)

    def process_act(self, path, act):
        if not path.startswith('act/') or self.a_bits.shape[0] == 0:
            return act
        bits = self.a_bits[int(path.split('/')[1])]
        return jnp.where(bits < 32, fq.fake_quant(act, bits).astype(act.dtype), act)


def init_codebooks(params, weight_paths: List[str], w_bit_list) -> Dict[str, jax.Array]:
    """Build per-layer codebooks from the (restored) weights
    (reference learner.py:118-135: clusters initialized *after* restore)."""
    from pocketflow_tpu.learners.weight_sparsification.masking import path_str
    flat = {path_str(p): leaf
            for p, leaf in jax.tree_util.tree_leaves_with_path(params)}
    bucket_type, bucket_size = bucket_spec()
    books = {}
    for path, bits in zip(weight_paths, w_bit_list):
        # policy paths are module paths ('conv1'); params leaves end '/kernel'
        books[path] = nuq.init_codebook(
            flat[path + '/kernel'], int(bits), FLAGS.nuql_init_style,
            bucket_type, bucket_size)
    return books
