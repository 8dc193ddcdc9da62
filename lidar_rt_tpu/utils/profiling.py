"""Profiling + failure-detection hooks.

Equivalents of the reference's debug machinery:
  * CUDA event timing / recorder wall-clock (train.py:112-151) ->
    `step_timer` + jax.profiler traces viewable in XProf/Perfetto,
  * the tracer's snapshot_fw/bw.dump on exception
    (diff_lidar_tracer/__init__.py:55-62,109-116) -> `guard_finite`, which
    snapshots the full training state when a non-finite loss appears,
  * torch.autograd anomaly mode (train.py:530) -> jax.debug_nans config
    toggle helper.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for [enter, exit) into `log_dir` (open with
    XProf / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Blocking per-step wall timer (the recorder's batch_time source)."""

    def __init__(self):
        self.last = time.perf_counter()

    def lap(self, result: Any = None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        dt = now - self.last
        self.last = now
        return dt


def enable_anomaly_detection(on: bool = True) -> None:
    """NaN tracing inside jitted code (detect_anomaly equivalent)."""
    jax.config.update("jax_debug_nans", on)


def guard_finite(metrics: dict, state: Any, snapshot_path: str,
                 context: str = "") -> None:
    """Raise (after snapshotting `state`) if any metric is non-finite —
    the snapshot_fw.dump equivalent for offline repro."""
    bad = {k: float(v) for k, v in metrics.items()
           if np.ndim(v) == 0 and not np.isfinite(float(v))}
    if bad:
        from lidar_rt_tpu.utils import checkpoint
        checkpoint.save(snapshot_path, state,
                        {"reason": f"non-finite metrics {bad}",
                         "context": context})
        raise FloatingPointError(
            f"non-finite metrics {bad} ({context}); state snapshot saved "
            f"to {snapshot_path}")
