"""Multi-chip scaling: ray-band sharding + frame data parallelism over ICI.

The reference is a single-GPU system (SURVEY §2.3): its only parallelism is
the per-pixel OptiX launch and per-Gaussian atomics.  On TPU those become
mesh axes:

  * "rays" — the azimuth axis of the scan is split into contiguous column
    bands; each chip bins + traces its own band against the *replicated*
    surfel set (rays are embarrassingly parallel in the forward pass).
    The backward transpose inserts the gradient psum over ICI — the moral
    equivalent of the reference's atomicAdd over the pixel grid.
  * "dp" — frames (scans) are data-parallel; gradients are averaged across
    the dp axis.

At LiDAR-RT scales the full parameter set is tens of MB, so parameters are
replicated; no tensor/pipeline sharding is needed (and none would pay off).
"""

from lidar_rt_tpu.parallel.sharding import (  # noqa: F401
    make_mesh, trace_ray_sharded)
from lidar_rt_tpu.parallel.train_step import (  # noqa: F401
    make_sharded_bin_fn, make_sharded_loss_fn, make_sharded_train_step,
    stack_batches)
from lidar_rt_tpu.parallel.trainer import ShardedTrainer  # noqa: F401
