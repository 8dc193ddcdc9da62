"""Multi-chip training orchestration: the single-chip Trainer's schedule
driving the sharded step.

The reference has no distributed layer at all (SURVEY.md §2.3); this is the
beyond-reference scale-out path.  All python-side schedule logic — shuffled
frame sampling, SH warm-up, densify/prune, opacity reset, warmup-K config
switching, BinCache invalidation, chunked scan dispatch, per-iteration
metrics — is inherited unchanged from train.loop.Trainer; only three hooks
differ:

  * `_make_step` builds the mesh-spanning sharded step
    (parallel/train_step.py) instead of the single-chip one,
  * `_sample_ids` draws dp DISTINCT frames per iteration (the sharded
    BinCache's dp-delta merge requires it),
  * `_fresh_bins` shapes the cache band-major over the rays axis.

Densify / opacity-reset themselves run replicated (every device applies the
same compaction to the same replicated scene — cheap at LiDAR-RT scales,
and it keeps the optimizer-moment surgery identical to the single-chip
path).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.sharding import Mesh

from lidar_rt_tpu.data.frames import LiDARFrames
from lidar_rt_tpu.ops import tracer as tracer_lib
from lidar_rt_tpu.parallel import train_step as sharded_step
from lidar_rt_tpu.scene import Scene
from lidar_rt_tpu.train import loop


class ShardedTrainer(loop.Trainer):
    """Trainer over a ("dp", "rays") mesh: each iteration trains
    mesh.shape["dp"] distinct frames, each scan split into
    mesh.shape["rays"] azimuth bands (see parallel/train_step.py for the
    loss semantics and its two documented band approximations)."""

    def __init__(self, scene: Scene, frames: LiDARFrames, args, mesh: Mesh,
                 **kwargs):
        self.mesh = mesh
        self.dp = int(mesh.shape["dp"])
        if frames.num_frames < self.dp:
            raise ValueError(
                f"dp={self.dp} needs at least that many frames "
                f"({frames.num_frames} available): each dp batch must hold "
                "distinct frames")
        super().__init__(scene, frames, args, **kwargs)

    def _make_step(self, cfg: tracer_lib.TraceConfig):
        return sharded_step.make_sharded_train_step(
            self.frames, self.args, cfg, self.opt_bg, self.opt_ac,
            self.mesh, self.rebin_every)

    def _fresh_bins(self, cfg: tracer_lib.TraceConfig) -> loop.BinCache:
        return sharded_step.fresh_bins(self.frames, cfg, self.mesh)

    def _sample_ids(self, n: int):
        """(n, dp) frame ids, distinct within each row (duplicates can
        only arise across a shuffle-epoch boundary; they are deferred to
        the next row)."""
        rows = []
        for _ in range(n):
            row: list[int] = []
            deferred: list[int] = []
            while len(row) < self.dp:
                f = self._next_frame()
                (row if f not in row else deferred).append(f)
            self._frame_stack.extend(deferred)
            rows.append(row)
        return jnp.asarray(rows, jnp.int32)
