"""Scene layer: asset init, actor pose composition, KNN init ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_rt_tpu.core import quaternions as quat_lib
from lidar_rt_tpu.ops import knn as knn_lib
from lidar_rt_tpu.scene import (GaussianAsset, Scene, TrackBuilder, compose,
                                dead_asset, from_points, split_by_asset,
                                stack_tracks)


def _brute_knn(points, k):
    d2 = np.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    np.fill_diagonal(d2, np.inf)
    idx = np.argsort(d2, axis=-1)[:, :k]
    return np.take_along_axis(d2, idx, axis=-1), idx


class TestKNN:
    def test_matches_brute_force_on_small_cloud(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        d2, _ = knn_lib.knn(jnp.asarray(pts), k=3, window=199)
        ref_d2, _ = _brute_knn(pts, 3)
        np.testing.assert_allclose(np.asarray(d2), ref_d2, rtol=1e-4)

    def test_windowed_is_close_on_large_cloud(self):
        # Morton window is approximate; mean 3NN distance should still be
        # within a few percent of exact on a uniform cloud.
        rng = np.random.default_rng(1)
        pts = rng.uniform(size=(5000, 3)).astype(np.float32)
        approx = np.asarray(knn_lib.mean_sq_dist_to_3nn(jnp.asarray(pts)))
        exact = _brute_knn(pts, 3)[0].mean(axis=-1)
        # every approx distance is >= exact; most should match exactly
        assert (approx >= exact - 1e-9).all()
        assert np.median(approx / exact) < 1.05

    def test_normals_on_plane(self):
        rng = np.random.default_rng(2)
        xy = rng.uniform(-1, 1, size=(500, 2)).astype(np.float32)
        pts = np.concatenate([xy, np.zeros((500, 1), np.float32)], axis=-1)
        n = knn_lib.estimate_normals(jnp.asarray(pts),
                                     jnp.array([0.0, 0.0, 5.0]), k=8)
        n = np.asarray(n)
        np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)
        assert (n[:, 2] > 0).all()  # oriented toward the sensor at +z


class TestAsset:
    def test_from_points_matches_reference_init(self):
        rng = np.random.default_rng(3)
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        color = rng.uniform(size=(50, 3)).astype(np.float32)
        asset = from_points(jnp.asarray(pts), jnp.asarray(color),
                            jax.random.key(0), capacity=64)
        assert asset.capacity == 64
        assert int(asset.num_alive) == 50
        # opacity init = 0.1 (gaussian_model.py:175)
        np.testing.assert_allclose(np.asarray(asset.opacity[:50]), 0.1,
                                   atol=1e-6)
        # dead slots composite to nothing
        assert np.asarray(asset.opacity[50:]).max() < 1e-10
        # DC SH round-trips the color triplet
        from lidar_rt_tpu.core import sh as sh_lib
        np.testing.assert_allclose(
            np.asarray(sh_lib.sh_to_rgb(asset.f_dc[:50, 0])), color,
            rtol=1e-5)
        # scales: log sqrt(mean 3NN sq dist), both axes equal
        d2 = np.clip(_brute_knn(pts, 3)[0].mean(-1), 1e-7, None)
        np.testing.assert_allclose(np.asarray(asset.log_scale[:50, 0]),
                                   0.5 * np.log(d2), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(asset.log_scale[:, 0]),
                                   np.asarray(asset.log_scale[:, 1]))

    def test_asset_is_a_pytree(self):
        asset = dead_asset(16)
        leaves = jax.tree.leaves(asset)
        assert len(leaves) == 8  # arrays only; metadata is static
        mapped = jax.tree.map(lambda x: x, asset)
        assert isinstance(mapped, GaussianAsset)
        assert mapped.extent == asset.extent

    def test_sh_degree_warmup(self):
        asset = dead_asset(4, max_sh_degree=3)
        for expected in (1, 2, 3, 3):
            asset = asset.one_up_sh_degree()
            assert int(asset.active_sh_degree) == expected


class TestTracks:
    def test_forward_fill(self):
        tb = TrackBuilder(num_frames=5, size=(4.0, 2.0, 1.5))
        tb.add_frame_pose(1, (1.0, 0.0, 0.0), (1.0, 0.0, 0.0, 0.0))
        tb.add_frame_pose(3, (3.0, 0.0, 0.0), (1.0, 0.0, 0.0, 0.0))
        tr = tb.build()
        t = np.asarray(tr.translations)
        # frame 0 backfilled from 1, frame 2 forward-filled from 1
        np.testing.assert_allclose(t[0], [1, 0, 0])
        np.testing.assert_allclose(t[2], [1, 0, 0])
        np.testing.assert_allclose(t[4], [3, 0, 0])
        assert list(np.asarray(tr.present)) == [False, True, False, True, False]

    def test_waymo_yaw_box(self):
        tb = TrackBuilder(num_frames=1, size=(4.0, 2.0, 1.5))
        ego2world = np.eye(4)
        tb.add_frame_waymo(0, (1.0, 2.0, 0.5), np.pi / 2, ego2world)
        tr = tb.build()
        r = np.asarray(quat_lib.to_rotation_matrix(tr.quats[0]))
        expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        np.testing.assert_allclose(r, expect, atol=1e-5)

    def test_mean_speed_gates_dynamic(self):
        tb = TrackBuilder(num_frames=3, size=(1, 1, 1))
        for f in range(3):
            tb.add_frame_pose(f, (f * 2.0, 0, 0), (1, 0, 0, 0))
        assert float(tb.build().mean_speed()) == pytest.approx(2.0)


class TestCompose:
    def _scene(self):
        rng = np.random.default_rng(4)
        bg = from_points(jnp.asarray(rng.normal(size=(10, 3)), jnp.float32),
                         jnp.full((10, 3), 0.5), jax.random.key(1), 16)
        actor_local = from_points(
            jnp.asarray(rng.normal(scale=0.3, size=(6, 3)), jnp.float32),
            jnp.full((6, 3), 0.5), jax.random.key(2), 8)
        tb = TrackBuilder(num_frames=2, size=(4, 2, 1.5))
        tb.add_frame_pose(0, (10.0, 0.0, 0.0), (1, 0, 0, 0))
        # frame 1: translated and rotated 90deg about z
        s2 = np.sqrt(0.5)
        tb.add_frame_pose(1, (20.0, 5.0, 0.0), (s2, 0, 0, s2))
        actors = jax.tree.map(lambda x: x[None], actor_local)
        return Scene(background=bg, actors=actors,
                     tracks=stack_tracks([tb.build()])), actor_local

    def test_static_frame_identity(self):
        scene, actor_local = self._scene()
        bundle, alive = compose(scene, jnp.asarray(0))
        assert bundle.means.shape == (24, 3)
        assert int(alive.sum()) == 16
        # background slots unchanged
        np.testing.assert_allclose(np.asarray(bundle.means[:16]),
                                   np.asarray(scene.background.xyz))
        # actor at identity rotation: translation only
        np.testing.assert_allclose(
            np.asarray(bundle.means[16:22]),
            np.asarray(actor_local.xyz[:6]) + np.array([10.0, 0, 0]),
            atol=1e-5)

    def test_rotated_frame_pose_composition(self):
        scene, actor_local = self._scene()
        bundle, _ = compose(scene, jnp.asarray(1))
        local = np.asarray(actor_local.xyz[:6])
        rot90 = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        expect = local @ rot90.T + np.array([20.0, 5.0, 0.0])
        np.testing.assert_allclose(np.asarray(bundle.means[16:22]), expect,
                                   atol=1e-5)
        # composed world rotation equals R_box @ R_local
        r_world = np.asarray(
            quat_lib.to_rotation_matrix(bundle.rotations[16:22]))
        r_local = np.asarray(
            quat_lib.to_rotation_matrix(actor_local.rotation[:6]))
        np.testing.assert_allclose(r_world, rot90 @ r_local, atol=1e-5)

    def test_split_by_asset_roundtrip(self):
        scene, _ = self._scene()
        flat = jnp.arange(scene.total_capacity)
        parts = split_by_asset(scene, flat)
        assert [p.shape[0] for p in parts] == [16, 8]
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(p) for p in parts]), np.asarray(flat))

    def test_compose_is_differentiable_and_jittable(self):
        scene, _ = self._scene()

        @jax.jit
        def loss(s, frame):
            bundle, _ = compose(s, frame)
            return jnp.sum(bundle.means ** 2) + jnp.sum(bundle.opacities)

        # allow_int: the scene pytree carries bool/int leaves (alive masks,
        # sh degree) which receive float0 gradients
        g = jax.grad(loss, allow_int=True)(scene, jnp.asarray(1))
        assert np.isfinite(np.asarray(g.background.xyz)).all()
        # actor local xyz receives gradient through the box rotation
        assert np.abs(np.asarray(g.actors.xyz)).max() > 0

    def test_decomp_rendering_subsets(self):
        scene, _ = self._scene()
        full, _ = compose(scene, jnp.asarray(0))
        bg_only, _ = compose(scene, jnp.asarray(0), decomp="background")
        obj_only, _ = compose(scene, jnp.asarray(0), decomp="object")
        # actor slots zeroed in background-only, bg slots zeroed in
        # object-only; union reconstructs the full opacities
        assert float(bg_only.opacities[16:].max()) == 0.0
        assert float(obj_only.opacities[:16].max()) == 0.0
        np.testing.assert_allclose(
            np.asarray(bg_only.opacities + obj_only.opacities),
            np.asarray(full.opacities), atol=1e-7)
