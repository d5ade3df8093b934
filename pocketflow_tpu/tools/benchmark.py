"""Inference-latency microbenchmark.

Rebuild of /root/reference/tools/benchmark/calc_inference_time.py:26-78: the
reference loads a frozen .pb and times 100 warmup + 100 timed sess.runs; here
we time a jitted forward on the current backend (TPU chip or CPU mesh).

Timing protocol (tunneled-backend safe): dispatch N calls over K DISTINCT
pre-staged device inputs (so no content-dedup is possible), then force true
completion with `jax.device_get` of the last output — the device executes
its stream in order, so all N calls have finished when the get returns.
`block_until_ready` does NOT synchronize remote execution on tunneled
backends and per-call scalar extraction adds ~tens of ms of round-trip, so
neither appears inside the timed loop.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pocketflow_tpu.core.metrics import get_logger

log = get_logger()


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(leaf.reshape(-1)[0]))


def _time_forward(fn, variables, inputs, nb_warmup: int, nb_timed: int):
    out = fn(variables, inputs[0])
    _sync(out)
    for i in range(nb_warmup):
        out = fn(variables, inputs[i % len(inputs)])
    _sync(out)
    start = time.perf_counter()
    for i in range(nb_timed):
        out = fn(variables, inputs[i % len(inputs)])
    _sync(out)
    return time.perf_counter() - start


def _staged_inputs(input_shape, dtype, nb: int = 4):
    return [jax.device_put(
        jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(11), i),
                          input_shape).astype(dtype)) for i in range(nb)]


def calc_inference_time(model, variables, input_shape,
                        nb_warmup: int = 100, nb_timed: int = 100,
                        dtype=jnp.float32) -> Dict[str, float]:
    """Returns {'latency_ms', 'throughput_per_sec'} for one jitted forward."""
    fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    inputs = _staged_inputs(input_shape, dtype)
    elapsed = _time_forward(fn, variables, inputs, nb_warmup, nb_timed)
    result = {'latency_ms': elapsed / nb_timed * 1000.0,
              'throughput_per_sec': input_shape[0] * nb_timed / elapsed}
    log.info('inference: %.3f ms/batch | %.1f samples/sec',
             result['latency_ms'], result['throughput_per_sec'])
    return result


def calc_quantized_inference_time(model, variables, input_shape,
                                  nb_calib_batches: int = 2,
                                  nb_warmup: int = 20, nb_timed: int = 50,
                                  dtype=None):
    """fp/bf16 vs int8-serving latency — the reference's TFLite 32->8bit
    latency comparison (docs/docs/performance.md:41-48), on the MXU.

    Returns {'float': {...}, 'int8': {...}, 'speedup': x}."""
    from pocketflow_tpu.nn.layers import compression
    from pocketflow_tpu.ops import int8_ops

    dtype = dtype or jnp.float32
    base = calc_inference_time(model, variables, input_shape,
                               nb_warmup, nb_timed, dtype)
    calib = [jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(7), i),
                               input_shape, jnp.float32)
             for i in range(nb_calib_batches)]
    act_scales = int8_ops.calibrate(model, variables, calib)
    weight_q = int8_ops.quantize_model_weights(variables['params'])
    policy = int8_ops.Int8ServingPolicy(weight_q, act_scales)

    def int8_forward(v, x):
        with compression(policy):
            return model.apply(v, x, train=False)

    fn = jax.jit(int8_forward)
    inputs = _staged_inputs(input_shape, dtype)
    elapsed = _time_forward(fn, variables, inputs, nb_warmup, nb_timed)
    int8_res = {'latency_ms': elapsed / nb_timed * 1000.0,
                'throughput_per_sec': input_shape[0] * nb_timed / elapsed}
    speedup = base['latency_ms'] / max(int8_res['latency_ms'], 1e-9)
    log.info('int8 serving: %.3f ms vs %.3f ms float (%.2fx)',
             int8_res['latency_ms'], base['latency_ms'], speedup)
    return {'float': base, 'int8': int8_res, 'speedup': speedup}
