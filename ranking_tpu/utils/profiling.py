"""Profiling and throughput instrumentation.

A strict superset of the reference's observability (a TensorBoard callback
writing per-epoch scalars, keras/pipeline.py:489-495): `jax.profiler`
device traces on demand plus a host-side step/throughput meter.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
  """Captures a device profile viewable in TensorBoard/XProf."""
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


class StepTimer:
  """Streaming examples/s and step-latency meter."""

  def __init__(self, window: int = 100):
    self.window = window
    self.reset()

  def reset(self) -> None:
    self._t0 = time.perf_counter()
    self._steps = 0
    self._examples = 0
    self._recent = []

  def step(self, batch_size: int) -> None:
    now = time.perf_counter()
    self._recent.append((now, batch_size))
    if len(self._recent) > self.window:
      self._recent.pop(0)
    self._steps += 1
    self._examples += batch_size

  def rates(self) -> Dict[str, float]:
    now = time.perf_counter()
    total_dt = max(now - self._t0, 1e-9)
    out = {
        'steps_per_sec': self._steps / total_dt,
        'examples_per_sec': self._examples / total_dt,
    }
    if len(self._recent) >= 2:
      dt = max(self._recent[-1][0] - self._recent[0][0], 1e-9)
      n = sum(b for _, b in self._recent[1:])
      out['recent_examples_per_sec'] = n / dt
    return out
