"""Procedural synthetic LiDAR dataset with analytic ground truth.

The reference has no test data generator (its smallest runnable config needs
a real KITTI-360 download); this module provides controlled scenes for unit
tests, end-to-end training checks, benchmarks and novel-sensor closed-loop
rollouts: a ground plane plus axis-aligned-ish boxes (static walls and an
optional moving actor), ray-cast exactly against the sensor raster.

Outputs a `LiDARFrames` (range/intensity images, 0 = dropped ray) and the
actor's ground-truth `ActorTrack`, so every stage from scene assembly to
eval metrics can be validated against analytic truth.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from lidar_rt_tpu.core import rays as rays_lib
from lidar_rt_tpu.data.frames import LiDARFrames
from lidar_rt_tpu.scene.tracks import ActorTrack, TrackBuilder

import jax.numpy as jnp


@dataclass
class Box:
    """Oriented box: center, full size, yaw about z; albedo in [0, 1]."""

    center: np.ndarray
    size: np.ndarray
    yaw: float = 0.0
    albedo: float = 0.8

    def rotation(self) -> np.ndarray:
        c, s = np.cos(self.yaw), np.sin(self.yaw)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


@dataclass
class SyntheticScene:
    """Ground plane at z=0 (albedo ground_albedo) + boxes; an optional
    moving actor box translating at `actor_velocity` per frame.

    extra_actors/extra_velocities: additional moving actors (the Waymo
    dynamic configs train multi-actor scenes; the format-true rehearsal
    generator uses these)."""

    walls: list[Box] = field(default_factory=list)
    ground_albedo: float = 0.4
    actor: Box | None = None
    actor_velocity: np.ndarray | None = None
    max_range: float = 80.0
    extra_actors: list[Box] = field(default_factory=list)
    extra_velocities: list[np.ndarray] = field(default_factory=list)

    def moving_boxes(self, frame: int) -> list[tuple[Box, np.ndarray]]:
        """All actor boxes with their frame-`frame` centers."""
        out = []
        if self.actor is not None:
            out.append((self.actor,
                        self.actor.center + frame * self.actor_velocity))
        for box, vel in zip(self.extra_actors, self.extra_velocities):
            out.append((box, box.center + frame * np.asarray(vel)))
        return out


def default_scene(with_actor: bool = True) -> SyntheticScene:
    walls = [
        Box(np.array([18.0, -6.0, 2.0]), np.array([2.0, 30.0, 4.0]),
            yaw=0.1, albedo=0.7),
        Box(np.array([-14.0, 8.0, 1.5]), np.array([3.0, 20.0, 3.0]),
            yaw=-0.2, albedo=0.6),
        Box(np.array([6.0, 14.0, 1.0]), np.array([4.0, 2.0, 2.0]),
            albedo=0.9),
    ]
    actor = Box(np.array([8.0, -2.0, 0.9]), np.array([4.2, 1.9, 1.6]),
                yaw=0.3, albedo=0.95) if with_actor else None
    vel = np.array([0.8, 0.15, 0.0]) if with_actor else None
    return SyntheticScene(walls=walls, actor=actor, actor_velocity=vel)


def _ray_box(origins: np.ndarray, dirs: np.ndarray, box: Box,
             center: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Slab-method ray/OBB intersection.  origins (3,), dirs (R, 3).
    Returns (t (R,), cos_incidence (R,)); misses get +inf."""
    r = box.rotation()
    o = (origins - center) @ r          # into box frame (r is orthonormal)
    d = dirs @ r
    half = box.size / 2.0
    inv = 1.0 / np.where(np.abs(d) > 1e-12, d, 1e-12)
    t1 = (-half - o) * inv
    t2 = (half - o) * inv
    tmin = np.minimum(t1, t2).max(axis=-1)
    tmax = np.maximum(t1, t2).min(axis=-1)
    hit = (tmax > np.maximum(tmin, 1e-3))
    t = np.where(hit, tmin, np.inf)
    # Entry face normal = axis of the largest |t1,t2| constraint.
    axis = np.abs(np.minimum(t1, t2) - tmin[..., None]).argmin(axis=-1)
    n_local = np.zeros_like(d)
    n_local[np.arange(d.shape[0]), axis] = -np.sign(
        d[np.arange(d.shape[0]), axis])
    cos_inc = np.abs(np.sum(-d * n_local, axis=-1))
    return t, cos_inc


def _cast_all(scene: SyntheticScene, grid: rays_lib.SensorGrid, width: int,
              sensor2world: np.ndarray, frame: int
              ) -> tuple[np.ndarray, np.ndarray]:
    """Ray-cast every surface: (t (R, S), intensity (R, S)); misses +inf."""
    origin_j, dirs_j = rays_lib.range_rays(grid, width,
                                           jnp.asarray(sensor2world))
    origin = np.asarray(origin_j)
    dirs = np.asarray(dirs_j).reshape(-1, 3)

    ts, its = [], []
    # Ground plane z=0.
    dz = dirs[:, 2]
    t_g = np.where(dz < -1e-6, -origin[2] / np.where(np.abs(dz) > 1e-12,
                                                     dz, -1e-12), np.inf)
    ts.append(t_g)
    its.append(scene.ground_albedo * np.abs(dz))

    boxes = [(b, b.center) for b in scene.walls] + scene.moving_boxes(frame)
    for box, center in boxes:
        t, cos_inc = _ray_box(origin, dirs, box, center)
        ts.append(t)
        its.append(box.albedo * np.clip(cos_inc, 0.1, 1.0))
    return (np.stack(ts, axis=-1).astype(np.float32),
            np.stack(its, axis=-1).astype(np.float32))


def render_frame_gt(scene: SyntheticScene, grid: rays_lib.SensorGrid,
                    width: int, sensor2world: np.ndarray, frame: int
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Exact (range (H, W), intensity (H, W)) for one frame; 0 = no return."""
    t_all, i_all = _cast_all(scene, grid, width, sensor2world, frame)
    best = np.argmin(t_all, axis=-1)
    rr = np.arange(t_all.shape[0])
    best_t, best_i = t_all[rr, best], i_all[rr, best]
    hit = best_t < scene.max_range
    h = grid.height
    rng_img = np.where(hit, best_t, 0.0).reshape(h, width).astype(np.float32)
    int_img = np.where(hit, np.clip(best_i, 0.0, 1.0),
                       0.0).reshape(h, width).astype(np.float32)
    return rng_img, int_img


def render_frame_gt_dual(scene: SyntheticScene, grid: rays_lib.SensorGrid,
                         width: int, sensor2world: np.ndarray, frame: int,
                         return_gap: float = 1.0
                         ) -> tuple[np.ndarray, ...]:
    """Dual-return ground truth: (r1, i1, r2, i2), each (H, W).

    Return 2 is the nearest surface at least `return_gap` meters past the
    first (the second laser echo; Waymo's dual-return range images —
    waymo_loader/__init__.py:92-102 parses both returns).  Rays with no
    second surface get 0."""
    t_all, i_all = _cast_all(scene, grid, width, sensor2world, frame)
    best = np.argmin(t_all, axis=-1)
    rr = np.arange(t_all.shape[0])
    best_t, best_i = t_all[rr, best], i_all[rr, best]

    t2_all = np.where(t_all >= best_t[:, None] + return_gap, t_all, np.inf)
    second = np.argmin(t2_all, axis=-1)
    t2, i2v = t2_all[rr, second], i_all[rr, second]

    h = grid.height

    def img(t, i):
        hit = t < scene.max_range
        return (np.where(hit, t, 0.0).reshape(h, width).astype(np.float32),
                np.where(hit, np.clip(i, 0.0, 1.0),
                         0.0).reshape(h, width).astype(np.float32))

    r1, i1 = img(best_t, best_i)
    r2, i2 = img(t2, i2v)
    return r1, i1, r2, i2


def generate(scene: SyntheticScene | None = None, num_frames: int = 6,
             height: int = 32, width: int = 256,
             inclination_bounds: tuple[float, float] = (-0.42, 0.08),
             sensor_height: float = 2.0, ego_velocity=(0.5, 0.0, 0.0),
             with_actor: bool = True,
             ) -> tuple[LiDARFrames, ActorTrack | None]:
    """Build a LiDARFrames sequence (+ ground-truth actor track)."""
    scene = scene or default_scene(with_actor)
    grid = rays_lib.SensorGrid.from_bounds(height, inclination_bounds)

    poses = np.tile(np.eye(4, dtype=np.float32), (num_frames, 1, 1))
    for f in range(num_frames):
        poses[f, :3, 3] = np.array([0.0, 0.0, sensor_height]) \
            + f * np.asarray(ego_velocity)

    r_imgs = np.zeros((num_frames, height, width), np.float32)
    i_imgs = np.zeros((num_frames, height, width), np.float32)
    for f in range(num_frames):
        r_imgs[f], i_imgs[f] = render_frame_gt(scene, grid, width,
                                               poses[f], f)

    frames = LiDARFrames(grid=grid, width=width, sensor2world=poses,
                         range1=r_imgs, intensity1=i_imgs,
                         frame_numbers=list(range(num_frames)))
    frames.split_train_eval(eval_stride=max(2, num_frames // 2))

    track = None
    if scene.actor is not None:
        tb = TrackBuilder(num_frames, scene.actor.size, object_id="actor0")
        for f in range(num_frames):
            center = scene.actor.center + f * scene.actor_velocity
            c, s = np.cos(scene.actor.yaw), np.sin(scene.actor.yaw)
            half = np.sqrt((1 + c) / 2)
            quat = np.array([half, 0.0, 0.0,
                             np.sign(s) * np.sqrt(max(0.0, (1 - c) / 2))],
                            np.float32)
            tb.add_frame_pose(f, center, quat)
        track = tb.build()
    return frames, track
