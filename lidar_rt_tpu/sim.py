"""Novel-sensor re-simulation: render trained scenes under new sensors.

This is the deployment surface of the framework (the "re-simulator" in
LiDAR-RT's title): given an optimized Scene, synthesize scans for
  * a modified beam pattern (any SensorGrid: different row count, beam
    table, FOV, azimuth resolution),
  * a modified pose trajectory (arbitrary sensor2world per step),
  * a closed-loop rollout, where a controller consumes each rendered scan
    and produces the next sensor pose (e.g. a driving policy being tested
    against the reconstructed world).

The reference supports this implicitly (its tracer takes arbitrary rays);
here it is a first-class API with jit-compiled open-loop batching.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from lidar_rt_tpu.core import rays as rays_lib
from lidar_rt_tpu.ops import tracer as tracer_lib
from lidar_rt_tpu.scene import Scene, compose

Array = jax.Array


def render_scan(scene: Scene, grid: rays_lib.SensorGrid, width: int,
                sensor2world: Array, frame: Array | int = 0,
                cfg: tracer_lib.TraceConfig | None = None,
                use_rayhit: bool = True) -> dict[str, Array]:
    """One scan from an arbitrary sensor pose/pattern.

    `frame` selects actor poses from the scene's track timeline (clamped);
    for frozen actors pass the frame they should hold."""
    cfg = cfg or tracer_lib.TraceConfig()
    bundle, _ = compose(scene, jnp.asarray(frame, jnp.int32))
    return tracer_lib.render_frame(bundle, grid, width, sensor2world,
                                   scene.background.active_sh_degree, cfg,
                                   use_rayhit)


def resimulate(scene: Scene, grid: rays_lib.SensorGrid, width: int,
               poses: Array, frame_indices: Array | None = None,
               cfg: tracer_lib.TraceConfig | None = None,
               drop_threshold: float = 0.4) -> dict[str, Array]:
    """Open-loop re-simulation over a pose trajectory.

    poses: (F, 4, 4); frame_indices: (F,) actor-timeline indices (defaults
    to 0..F-1 clamped to the track length).  Returns stacked (F, H, W)
    depth / intensity / raydrop plus the thresholded range image
    (depth * hit mask — scan-compatible with recorded data, 0 = dropped).
    """
    cfg = cfg or tracer_lib.TraceConfig()
    f = poses.shape[0]
    if frame_indices is None:
        limit = scene.tracks.translations.shape[1] - 1 \
            if scene.tracks is not None else 0
        frame_indices = jnp.minimum(jnp.arange(f), limit)

    @jax.jit
    def step(carry, inp):
        pose, frame = inp
        out = render_scan(scene, grid, width, pose, frame, cfg)
        hit = out["raydrop"] < drop_threshold
        return carry, {"depth": out["depth"], "intensity": out["intensity"],
                       "raydrop": out["raydrop"],
                       "range_image": out["depth"] * hit}

    _, outs = jax.lax.scan(step, None,
                           (poses, frame_indices.astype(jnp.int32)))
    return outs


def rollout(scene: Scene, grid: rays_lib.SensorGrid, width: int,
            initial_pose: Array,
            controller: Callable[[dict, Array, int], Array],
            num_steps: int, cfg: tracer_lib.TraceConfig | None = None
            ) -> tuple[Array, dict[str, list]]:
    """Closed-loop rollout: controller(scan_dict, pose, step) -> next pose.

    The controller runs at the host level (it may be an arbitrary policy,
    not necessarily jittable); each render is jit-cached.  Returns the
    visited poses (S+1, 4, 4) and the per-step scan dict lists."""
    cfg = cfg or tracer_lib.TraceConfig()
    render = jax.jit(lambda pose, frame: render_scan(
        scene, grid, width, pose, frame, cfg))

    pose = initial_pose
    poses = [pose]
    scans: dict[str, list] = {"depth": [], "intensity": [], "raydrop": []}
    limit = scene.tracks.translations.shape[1] - 1 \
        if scene.tracks is not None else 0
    for s in range(num_steps):
        out = render(pose, jnp.asarray(min(s, limit), jnp.int32))
        for k in scans:
            scans[k].append(out[k])
        pose = controller(out, pose, s)
        poses.append(pose)
    return jnp.stack(poses), scans
