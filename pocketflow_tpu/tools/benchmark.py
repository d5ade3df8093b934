"""Inference-latency microbenchmark.

Rebuild of /root/reference/tools/benchmark/calc_inference_time.py:26-78: the
reference loads a frozen .pb and times 100 warmup + 100 timed sess.runs; here
we time a jitted forward on the current backend (TPU chip or CPU mesh).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pocketflow_tpu.core.metrics import get_logger

log = get_logger()


def calc_inference_time(model, variables, input_shape,
                        nb_warmup: int = 100, nb_timed: int = 100,
                        dtype=jnp.float32) -> Dict[str, float]:
    """Returns {'latency_ms', 'throughput_per_sec'} for one jitted forward."""
    fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    x = jnp.zeros(input_shape, dtype)
    out = fn(variables, x)
    jax.block_until_ready(out)
    for _ in range(nb_warmup):
        out = fn(variables, x)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(nb_timed):
        out = fn(variables, x)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    latency_ms = elapsed / nb_timed * 1000.0
    result = {'latency_ms': latency_ms,
              'throughput_per_sec': input_shape[0] * nb_timed / elapsed}
    log.info('inference: %.3f ms/batch | %.1f samples/sec',
             result['latency_ms'], result['throughput_per_sec'])
    return result
