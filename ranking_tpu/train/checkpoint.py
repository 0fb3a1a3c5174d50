"""Checkpoint / resume / best-export via Orbax.

Replaces the reference's callback trio — ``BackupAndRestore`` (preemption
recovery), ``ModelCheckpoint(save_best_only)`` and the latest/best SavedModel
exports (tensorflow_ranking/python/keras/pipeline.py:492-510,634-650) — with
an Orbax ``CheckpointManager`` over the ``TrainState`` pytree plus a small
JSON sidecar of metric values for best-tracking.
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping, Optional

import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
  """Latest + best-by-metric checkpointing of a TrainState.

  Two Orbax managers, because a single one cannot express both retention
  policies at once: with ``best_fn`` set, Orbax's ``max_to_keep`` keeps
  the best-N and garbage-collects the LATEST checkpoints — a preempted
  run would silently resume from the old best step, repeating epochs.
  Here ``<dir>`` keeps the latest N (resume always from the true latest)
  and ``<dir>/best`` keeps the single best-by-metric (for export)."""

  def __init__(self, directory: str, max_to_keep: int = 3,
               best_metric: Optional[str] = None,
               best_mode: str = 'max'):
    self.directory = os.path.abspath(directory)
    os.makedirs(self.directory, exist_ok=True)
    self.best_metric = best_metric
    self.best_mode = best_mode
    self._mgr = ocp.CheckpointManager(
        self.directory,
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True))
    self._best = None
    if best_metric:
      self._best = ocp.CheckpointManager(
          os.path.join(self.directory, 'best'),
          options=ocp.CheckpointManagerOptions(
              max_to_keep=1, create=True,
              best_fn=lambda m: m[best_metric],
              best_mode=best_mode))

  def save(self, state: Any, metrics: Optional[Mapping[str, float]] = None,
           force: bool = False) -> None:
    step = int(state.step)
    metrics = {k: float(v) for k, v in (metrics or {}).items()}
    self._mgr.save(step, args=ocp.args.StandardSave(_savable(state)),
                   metrics=metrics or None, force=force)
    if self._best is not None and metrics:
      if self.best_metric not in metrics:
        # Fail here with a clear message — Orbax's best_fn would raise a
        # bare KeyError later, possibly from the async retention path.
        raise ValueError(
            f'best_metric {self.best_metric!r} missing from save metrics '
            f'{sorted(metrics)}')
      # Orbax's best_fn drives retention only, not should_save: without
      # this check every eval would serialize the FULL TrainState (multi-
      # GB for sparse tables) into <dir>/best and then garbage-collect it
      # when not best. Skip the write when strictly not better; if the
      # previous best's metrics can't be read, save (GC keeps it correct).
      skip = False
      prev_step = self._best.best_step()
      if prev_step is not None and not force:
        try:
          prev = (self._best.metrics(prev_step) or {}).get(self.best_metric)
        except Exception:
          prev = None
        if prev is not None:
          current = metrics[self.best_metric]
          skip = (current <= prev if self.best_mode == 'max'
                  else current >= prev)
      if not skip:
        self._best.save(step, args=ocp.args.StandardSave(_savable(state)),
                        metrics=metrics, force=force)

  def wait(self) -> None:
    self._mgr.wait_until_finished()
    if self._best is not None:
      self._best.wait_until_finished()

  def restore(self, state: Any, step: Optional[int] = None) -> Any:
    """Restores into the structure of ``state`` (a freshly-built template)."""
    if step is None:
      step = self._mgr.latest_step()
    if step is None:
      return state
    try:
      restored = self._mgr.restore(
          step, args=ocp.args.StandardRestore(_savable(state)))
    except (ValueError, KeyError) as e:
      raise ValueError(
          f'Checkpoint at {self.directory} step {step} does not match the '
          f'current TrainState structure — commonly a sparse/dense '
          f'optimizer toggle (sparse_opt_state present on one side only). '
          f'Use a fresh model_dir or the original optimizer. '
          f'Original error: {e}') from e
    return _merge(state, restored)

  def restore_best(self, state: Any) -> Any:
    """Restores the best-by-metric checkpoint (template = ``state``)."""
    if self._best is None:
      return state
    step = self._best.best_step()
    if step is None:
      return state
    try:
      restored = self._best.restore(
          step, args=ocp.args.StandardRestore(_savable(state)))
    except (ValueError, KeyError) as e:
      # Same explanatory wrapping as restore(): the raw Orbax error for a
      # structure mismatch is opaque (and may surface from the async
      # path).
      raise ValueError(
          f'Best checkpoint at {self.directory}/best step {step} does not '
          f'match the current TrainState structure — commonly a sparse/'
          f'dense optimizer toggle (sparse_opt_state present on one side '
          f'only). Use a fresh model_dir or the original optimizer. '
          f'Original error: {e}') from e
    return _merge(state, restored)

  def latest_step(self) -> Optional[int]:
    return self._mgr.latest_step()

  def best_step(self) -> Optional[int]:
    return self._best.best_step() if self._best is not None else None

  def close(self) -> None:
    self.wait()
    self._mgr.close()
    if self._best is not None:
      self._best.close()


def _savable(state: Any) -> Mapping[str, Any]:
  """The array-bearing portion of a TrainState (tx/apply_fn are code)."""
  out = {
      'step': state.step,
      'params': state.params,
      'batch_stats': state.batch_stats,
      'opt_state': state.opt_state,
  }
  if getattr(state, 'sparse_opt_state', None) is not None:
    out['sparse_opt_state'] = state.sparse_opt_state
  return out


def _merge(state: Any, restored: Mapping[str, Any]) -> Any:
  state = state.replace(
      step=restored['step'],
      params=restored['params'],
      batch_stats=restored['batch_stats'],
      opt_state=restored['opt_state'])
  if 'sparse_opt_state' in restored:
    state = state.replace(sparse_opt_state=restored['sparse_opt_state'])
  return state


def export_params(state: Any, path: str) -> None:
  """One-shot export of inference params (the SavedModel-export analog:
  serving = these params + the jitted apply fn + a host parse shim).
  Overwrites an existing export, matching SavedModel re-export behavior."""
  ckptr = ocp.StandardCheckpointer()
  ckptr.save(os.path.abspath(path),
             {'params': state.params, 'batch_stats': state.batch_stats},
             force=True)
  ckptr.wait_until_finished()
  ckptr.close()


def load_params(path: str, template: Optional[Any] = None) -> Any:
  ckptr = ocp.StandardCheckpointer()
  try:
    if template is not None:
      return ckptr.restore(os.path.abspath(path), template)
    return ckptr.restore(os.path.abspath(path))
  finally:
    ckptr.close()


def write_metrics_log(directory: str, step: int,
                      metrics: Mapping[str, float]) -> None:
  """Appends a JSON line of metric values (host-side TensorBoard-scalar
  analog; keras/pipeline.py:489-495)."""
  os.makedirs(directory, exist_ok=True)
  with open(os.path.join(directory, 'metrics.jsonl'), 'a') as f:
    f.write(json.dumps({'step': int(step),
                        **{k: float(np.asarray(v))
                           for k, v in metrics.items()}}) + '\n')
