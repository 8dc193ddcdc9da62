"""LiDARFrames: the sensor-data container every dataset loader produces.

Equivalent of the reference's `LiDARSensor` (lib/scene/lidar_sensor.py:20-168)
as a host-side dataclass over dense numpy arrays: per-frame range images for
up to two returns, per-frame sensor->world poses, and the `SensorGrid` raster
description (core/rays.py) that defines the ray model.  Frames are indexed
by position in the loaded list.

Accessors mirror the reference API:
  mask/depth/intensity(frame, return_num)  (lidar_sensor.py:53-69)
  inverse_projection(frame)  -> world points + intensities of both returns
                                (lidar_sensor.py:125-168)
  points_from_range(frame, range_image)  (range2point, :325-393)
  normals(frame)  -> cross-product normals from depth (:71-81)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from lidar_rt_tpu.core import rays as rays_lib

Array = jax.Array


@dataclass
class LiDARFrames:
    """range1/range2: (F, H, W) meters, 0 = no return.
    intensity1/intensity2: (F, H, W) in [0, 1].
    sensor2world: (F, 4, 4).  frame_numbers: original dataset frame ids."""

    grid: rays_lib.SensorGrid
    width: int
    sensor2world: np.ndarray
    range1: np.ndarray
    intensity1: np.ndarray
    range2: np.ndarray | None = None
    intensity2: np.ndarray | None = None
    frame_numbers: list[int] = field(default_factory=list)
    train_frames: list[int] = field(default_factory=list)
    eval_frames: list[int] = field(default_factory=list)

    @property
    def num_frames(self) -> int:
        return self.range1.shape[0]

    @property
    def height(self) -> int:
        return self.range1.shape[1]

    def _ret(self, return_num: int) -> tuple[np.ndarray, np.ndarray]:
        if return_num == 1 or self.range2 is None:
            return self.range1, self.intensity1
        return self.range2, self.intensity2

    def mask(self, frame: int, return_num: int = 1) -> Array:
        r, _ = self._ret(return_num)
        return jnp.asarray(r[frame] != 0)

    def depth(self, frame: int, return_num: int = 1) -> Array:
        r, _ = self._ret(return_num)
        return jnp.asarray(r[frame], jnp.float32)

    def intensity(self, frame: int, return_num: int = 1) -> Array:
        _, i = self._ret(return_num)
        return jnp.asarray(i[frame], jnp.float32)

    def pose(self, frame: int) -> Array:
        return jnp.asarray(self.sensor2world[frame], jnp.float32)

    def sensor_center(self, frame: int) -> Array:
        return jnp.asarray(self.sensor2world[frame][:3, 3], jnp.float32)

    def rays(self, frame: int) -> tuple[Array, Array]:
        """(origin (3,), dirs (H, W, 3)) world-frame rays
        (get_range_rays, lidar_sensor.py:395-434)."""
        return rays_lib.range_rays(self.grid, self.width, self.pose(frame))

    def points_from_range(self, frame: int, range_image: Array) -> Array:
        """Back-project any (H, W) range image using this frame's pose."""
        return rays_lib.range_to_points(self.grid, range_image,
                                        self.pose(frame))

    def inverse_projection(self, frame: int
                           ) -> tuple[np.ndarray, np.ndarray]:
        """All valid points of both returns -> (world pts (N, 3),
        intensities (N,)), numpy (scene-assembly input)."""
        pts_all, int_all = [], []
        returns = (1, 2) if self.range2 is not None else (1,)
        for ret in returns:
            r, i = self._ret(ret)
            valid = r[frame] > 0
            pts = np.asarray(self.points_from_range(
                frame, jnp.asarray(r[frame], jnp.float32)))
            pts_all.append(pts[valid])
            int_all.append(i[frame][valid])
        return (np.concatenate(pts_all, axis=0).astype(np.float32),
                np.concatenate(int_all, axis=0).astype(np.float32))

    def normals(self, frame: int, return_num: int = 1) -> Array:
        """Per-pixel normals from range-image cross products
        (lidar_sensor.py:71-81, lib/utils/other_utils.py:4-14), oriented
        toward the sensor."""
        r, _ = self._ret(return_num)
        pts = self.points_from_range(frame, jnp.asarray(r[frame], jnp.float32))
        dzdx = jnp.roll(pts, -1, axis=0) - jnp.roll(pts, 1, axis=0)
        dzdy = jnp.roll(pts, -1, axis=1) - jnp.roll(pts, 1, axis=1)
        n = jnp.cross(dzdx, dzdy)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        to_sensor = self.sensor_center(frame) - pts
        sign = jnp.where(jnp.sum(n * to_sensor, axis=-1, keepdims=True) < 0,
                         -1.0, 1.0)
        return n * sign

    def split_train_eval(self, eval_stride: int = 10) -> None:
        """Default split: every `eval_stride`-th frame is held out (the
        reference's data configs list explicit eval frames; this is the
        fallback)."""
        all_f = list(range(self.num_frames))
        self.eval_frames = all_f[eval_stride // 2::eval_stride]
        self.train_frames = [f for f in all_f if f not in self.eval_frames]
