"""Evaluation layer: metric suite + eval runner (eval.py equivalent)."""

from lidar_rt_tpu.eval.metrics import (  # noqa: F401
    depth_metrics, intensity_metrics, points_metrics, raydrop_metrics)
from lidar_rt_tpu.eval.runner import EvalRunner  # noqa: F401
