"""Novel-sensor re-simulation: modified beam patterns, trajectories,
closed-loop rollout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_rt_tpu.config import default_experiment
from lidar_rt_tpu.core import rays as rays_lib
from lidar_rt_tpu.data import build, synthetic
from lidar_rt_tpu import sim
from lidar_rt_tpu.ops import tracer as tracer_lib
from lidar_rt_tpu.ops.binning import TileConfig

CFG = tracer_lib.TraceConfig(
    tile=TileConfig(tile_h=16, tile_w=64, max_per_tile=128), tile_batch=2,
    engine="jax")


@pytest.fixture(scope="module")
def scene():
    frames, track = synthetic.generate(num_frames=3, height=16, width=128)
    args = default_experiment()
    sc = build.assemble_scene(frames, [track], args, capacity_headroom=1.0)
    # make the init surfels opaque enough to register returns
    import dataclasses
    bg = sc.background
    sc = dataclasses.replace(
        sc, background=dataclasses.replace(
            bg, opacity_logit=jnp.where(bg.alive, 2.0, bg.opacity_logit)))
    return sc


class TestResimulate:
    def test_modified_beam_pattern(self, scene):
        # double the vertical resolution vs the training sensor
        grid = rays_lib.SensorGrid.from_bounds(32, (-0.42, 0.08))
        pose = jnp.eye(4).at[2, 3].set(2.0)
        out = sim.render_scan(scene, grid, 256, pose, 0, CFG)
        assert out["depth"].shape == (32, 256)
        assert np.isfinite(np.asarray(out["depth"])).all()
        # scene content must register: some rays return
        assert (np.asarray(out["raydrop"]) < 0.4).mean() > 0.1

    def test_trajectory_batch(self, scene):
        grid = rays_lib.SensorGrid.from_bounds(16, (-0.42, 0.08))
        poses = jnp.stack([jnp.eye(4).at[2, 3].set(2.0).at[0, 3].set(f * 1.0)
                           for f in range(4)])
        outs = sim.resimulate(scene, grid, 128, poses)
        assert outs["depth"].shape == (4, 16, 128)
        assert outs["range_image"].shape == (4, 16, 128)
        # dropped rays are zeroed in the scan-compatible range image
        ri = np.asarray(outs["range_image"])
        rd = np.asarray(outs["raydrop"])
        assert (ri[rd >= 0.4] == 0).all()
        # moving the sensor changes the scan
        assert np.abs(np.asarray(outs["depth"][0])
                      - np.asarray(outs["depth"][3])).max() > 0.1

    def test_closed_loop_rollout(self, scene):
        grid = rays_lib.SensorGrid.from_bounds(16, (-0.42, 0.08))

        def controller(scan, pose, step):
            # toy policy: advance proportionally to median forward range
            d = scan["depth"][:, 60:68]
            speed = jnp.clip(jnp.median(d) * 0.05, 0.1, 1.0)
            return pose.at[0, 3].add(speed)

        poses, scans = sim.rollout(
            scene, grid, 128, jnp.eye(4).at[2, 3].set(2.0), controller, 3,
            CFG)
        assert poses.shape == (4, 4, 4)
        assert len(scans["depth"]) == 3
        x = np.asarray(poses[:, 0, 3])
        assert (np.diff(x) > 0).all()  # the policy drove forward
