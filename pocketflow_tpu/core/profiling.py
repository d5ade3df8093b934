"""Profiling hooks.

SURVEY.md §5.1: the reference has no profiler integration — throughput is a
hand-computed pics/sec counter.  The rebuild keeps that counter
(core/metrics.SpeedMeter) and adds proper `jax.profiler` traces: enable with
``--enbl_profiler`` to capture a trace of steps
[profiler_start_step, profiler_start_step + profiler_nb_steps) into
``<log_dir>/profile`` for TensorBoard / xprof.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.core.metrics import get_logger

FLAGS.DEFINE_boolean('enbl_profiler', False, 'capture a jax.profiler trace')
FLAGS.DEFINE_integer('profiler_start_step', 10, 'first step of the trace window')
FLAGS.DEFINE_integer('profiler_nb_steps', 5, '# of steps to trace')


class ProfilerHook:
    """Start/stop a jax.profiler trace around a step window."""

    def __init__(self, log_dir: Optional[str] = None):
        self.enabled = bool(FLAGS.enbl_profiler)
        self.log_dir = os.path.join(log_dir or FLAGS.log_dir, 'profile')
        self.start_step = int(FLAGS.profiler_start_step)
        self.stop_step = self.start_step + int(FLAGS.profiler_nb_steps)
        self._active = False
        self.log = get_logger()

    def before_step(self, step: int):
        if self.enabled and not self._active and step == self.start_step:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True
            self.log.info('profiler trace started (steps %d-%d) -> %s',
                          self.start_step, self.stop_step, self.log_dir)

    def after_step(self, step: int):
        if self._active and step + 1 >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False
            self.log.info('profiler trace written to %s', self.log_dir)

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
