"""Data layer: synthetic ground truth, frame container, scene assembly."""

import jax.numpy as jnp
import numpy as np
import pytest

from lidar_rt_tpu.config import default_experiment
from lidar_rt_tpu.data import build, synthetic
from lidar_rt_tpu.data.frames import LiDARFrames


@pytest.fixture(scope="module")
def dataset():
    return synthetic.generate(num_frames=4, height=24, width=192)


class TestSynthetic:
    def test_shapes_and_validity(self, dataset):
        frames, track = dataset
        assert frames.range1.shape == (4, 24, 192)
        assert track is not None and track.num_frames == 4
        # some rays hit (ground everywhere below horizon), some drop
        m = frames.range1 > 0
        assert 0.2 < m.mean() < 1.0
        assert frames.intensity1[m].min() >= 0.0
        assert frames.intensity1[m].max() <= 1.0

    def test_ground_plane_depth_analytic(self, dataset):
        frames, _ = dataset
        # A downward ray at azimuth behind the scene boxes: range =
        # sensor_height / sin(|inclination|).  Column 0 is azimuth ~ -pi
        # (behind), bottom row has the steepest downward inclination.
        grid = frames.grid
        rng = frames.range1[0]
        row = 23
        incl = float(grid.row_inclinations[row])
        expect = 2.0 / np.sin(-incl)
        got = rng[row, 0]
        assert got == pytest.approx(expect, rel=1e-3)

    def test_actor_moves_between_frames(self, dataset):
        frames, track = dataset
        t = np.asarray(track.translations)
        assert np.linalg.norm(t[3] - t[0]) > 2.0

    def test_inverse_projection_roundtrip(self, dataset):
        frames, _ = dataset
        pts, inten = frames.inverse_projection(0)
        assert pts.shape[0] == (frames.range1[0] > 0).sum()
        # points lie at the measured range from the sensor center
        center = np.asarray(frames.sensor_center(0))
        d = np.linalg.norm(pts - center, axis=1)
        np.testing.assert_allclose(np.sort(d),
                                   np.sort(frames.range1[0][
                                       frames.range1[0] > 0]), rtol=1e-4)

    def test_normals_on_ground(self, dataset):
        frames, _ = dataset
        n = np.asarray(frames.normals(0))
        rng = frames.range1[0]
        # bottom rows mostly see the ground: normal ~ +z
        ground = (rng[20] > 0) & (rng[20] < 10)
        assert np.median(n[20][ground][:, 2]) > 0.9


class TestVoxelDownsample:
    def test_means_per_voxel(self):
        pts = np.array([[0.01, 0, 0], [0.02, 0, 0], [5.0, 5.0, 5.0]],
                       np.float32)
        attr = np.array([[1.0], [3.0], [10.0]], np.float32)
        out_pts, (out_attr,) = build.voxel_downsample(pts, [attr], 0.15)
        assert out_pts.shape[0] == 2
        order = np.argsort(out_pts[:, 0])
        np.testing.assert_allclose(out_pts[order[0]], [0.015, 0, 0],
                                   atol=1e-6)
        np.testing.assert_allclose(out_attr[order[0]], [2.0])


class TestAssembly:
    def test_static_scene(self, dataset):
        frames, _ = dataset
        args = default_experiment()
        scene = build.assemble_scene(frames, None, args)
        assert scene.actors is None
        n_alive = int(scene.background.num_alive)
        assert n_alive > 500
        assert scene.background.capacity % 1024 == 0
        assert scene.background.extent > 10

    def test_dynamic_scene_carves_actor(self, dataset):
        frames, track = dataset
        args = default_experiment()
        scene = build.assemble_scene(frames, [track], args)
        assert scene.num_actors == 1
        # actor asset is padded to obj_pt_num
        assert int(scene.actors.num_alive) == args.model.obj_pt_num
        # carved actor points are box-local: inside the box
        alive = np.asarray(scene.actors.alive[0])
        local = np.asarray(scene.actors.xyz[0])[alive]
        size = np.asarray(track.size)
        assert (np.abs(local) <= size / 2 + 1e-4).all()
        # background no longer contains points inside the actor box at f0
        from lidar_rt_tpu.core import quaternions as quat_lib
        bg_alive = np.asarray(scene.background.alive)
        bg = np.asarray(scene.background.xyz)[bg_alive]
        r = np.asarray(quat_lib.to_rotation_matrix(track.quats[0]))
        t = np.asarray(track.translations[0])
        local_bg = (bg - t) @ r
        inside = (np.abs(local_bg) < size / 2 * 0.9).all(axis=1)
        assert inside.mean() < 0.02  # voxel averaging may leave strays

    def test_slow_actor_filtered(self, dataset):
        frames, track = dataset
        import dataclasses as dc
        frozen = dc.replace(
            track, translations=jnp.broadcast_to(track.translations[0],
                                                 track.translations.shape))
        args = default_experiment()
        scene = build.assemble_scene(frames, [frozen], args)
        assert scene.actors is None
