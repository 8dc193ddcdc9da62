"""Unit tests for the pure-math core: quaternions, SH, rays, transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_rt_tpu.core import quaternions as quat
from lidar_rt_tpu.core import rays, sh, transforms


KEY = jax.random.PRNGKey(0)


class TestQuaternions:
    def test_identity(self):
        q = jnp.array([1.0, 0.0, 0.0, 0.0])
        np.testing.assert_allclose(quat.to_rotation_matrix(q), np.eye(3), atol=1e-6)

    def test_known_rotation_z90(self):
        # 90 deg about z: x -> y.
        a = np.pi / 2
        q = jnp.array([np.cos(a / 2), 0.0, 0.0, np.sin(a / 2)])
        r = quat.to_rotation_matrix(q)
        np.testing.assert_allclose(r @ jnp.array([1.0, 0, 0]),
                                   [0.0, 1.0, 0.0], atol=1e-6)

    def test_matrix_roundtrip(self):
        q = quat.normalize(jax.random.normal(KEY, (256, 4)))
        q = q * jnp.where(q[:, :1] < 0, -1.0, 1.0)
        r = quat.to_rotation_matrix(q)
        q2 = quat.from_rotation_matrix(r)
        np.testing.assert_allclose(q, q2, atol=1e-5)

    def test_multiply_composes(self):
        a = quat.normalize(jax.random.normal(KEY, (32, 4)))
        b = quat.normalize(jax.random.normal(jax.random.PRNGKey(1), (32, 4)))
        lhs = quat.to_rotation_matrix(quat.multiply(a, b))
        rhs = quat.to_rotation_matrix(a) @ quat.to_rotation_matrix(b)
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_normalize_in_to_rotation_matrix(self):
        q = jnp.array([2.0, 0.0, 0.0, 0.0])
        np.testing.assert_allclose(quat.to_rotation_matrix(q), np.eye(3), atol=1e-6)

    def test_rotation_matrix_is_orthonormal(self):
        q = quat.normalize(jax.random.normal(KEY, (64, 4)))
        r = quat.to_rotation_matrix(q)
        eye = jnp.broadcast_to(jnp.eye(3), r.shape)
        np.testing.assert_allclose(r @ jnp.swapaxes(r, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(r), jnp.ones(64), atol=1e-5)

    def test_vjp_matches_autodiff(self):
        q = jax.random.normal(KEY, (8, 4))
        g = jax.random.normal(jax.random.PRNGKey(2), (8, 3, 3))
        manual = quat.rotation_matrix_vjp(q, g)
        _, pullback = jax.vjp(quat.to_rotation_matrix, q)
        np.testing.assert_allclose(manual, pullback(g)[0], atol=1e-6)

    def test_random_with_fixed_normal(self):
        n = jax.random.normal(KEY, (128, 3))
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        q = quat.random_with_fixed_normal(jax.random.PRNGKey(3), n)
        r = quat.to_rotation_matrix(q)
        np.testing.assert_allclose(r[..., :, 2], n, atol=1e-5)

    def test_random_with_fixed_normal_degenerate(self):
        n = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
        q = quat.random_with_fixed_normal(jax.random.PRNGKey(4), n)
        r = quat.to_rotation_matrix(q)
        np.testing.assert_allclose(r[..., :, 2], n, atol=1e-5)


class TestSH:
    def test_dc_only(self):
        coeffs = jnp.zeros((5, 16, 3)).at[:, 0, :].set(1.0)
        dirs = jax.random.normal(KEY, (5, 3))
        out = sh.evaluate(coeffs, dirs, 0)
        np.testing.assert_allclose(out, sh.C0 + 0.5, atol=1e-6)

    def test_degree_masking(self):
        coeffs = jax.random.normal(KEY, (7, 16, 3))
        dirs = jax.random.normal(jax.random.PRNGKey(1), (7, 3))
        out0 = sh.evaluate(coeffs, dirs, 0)
        # Degree-0 result must ignore all higher coefficients.
        coeffs_zeroed = coeffs.at[:, 1:, :].set(0.0)
        np.testing.assert_allclose(out0, sh.evaluate(coeffs_zeroed, dirs, 3),
                                   atol=1e-6)

    def test_rgb_sh_roundtrip(self):
        x = jax.random.uniform(KEY, (10, 3))
        np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(x)), x, atol=1e-6)

    def test_matches_polynomial_reference(self):
        # Degree-3 evaluation vs an independent direct polynomial (numpy).
        dirs = np.array([[0.3, -0.5, 0.81], [1.0, 0.0, 0.0], [0.0, 0.2, -0.9]])
        dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        b = np.asarray(sh.basis(jnp.asarray(dirs), 3))
        x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
        np.testing.assert_allclose(b[:, 0], sh.C0, atol=1e-6)
        np.testing.assert_allclose(b[:, 1], -sh.C1 * y, atol=1e-6)
        np.testing.assert_allclose(b[:, 6], sh.C2[2] * (2 * z * z - x * x - y * y),
                                   atol=1e-6)
        np.testing.assert_allclose(b[:, 15], sh.C3[6] * x * (x * x - 3 * y * y),
                                   atol=1e-6)


class TestRays:
    def _grid(self):
        return rays.SensorGrid.from_bounds(66, (-0.32, 0.03), pixel_offset=0.0)

    def test_dirs_unit(self):
        d = rays.sensor_dirs(self._grid(), 1030)
        np.testing.assert_allclose(jnp.linalg.norm(d, axis=-1),
                                   np.ones((66, 1030)), atol=1e-6)

    def test_projection_roundtrip_linear(self):
        """range2point(get_range_rays . depth) == identity on pixel centers."""
        grid = self._grid()
        w = 1030
        s2w = jnp.eye(4)
        rng = 5.0 + jax.random.uniform(KEY, (66, w)) * 40.0
        pts = rays.range_to_points(grid, rng, s2w)
        row, col, r = rays.project_points(grid, pts, jnp.eye(4), w)
        ii, jj = jnp.meshgrid(jnp.arange(66.0), jnp.arange(float(w)), indexing="ij")
        np.testing.assert_allclose(r, rng, rtol=1e-5)
        np.testing.assert_allclose(row, ii, atol=2e-3)
        np.testing.assert_allclose(col, jj, atol=2e-3)

    def test_projection_roundtrip_beams(self):
        beams = np.sort(np.random.RandomState(0).uniform(-0.3, 0.04, 64))
        grid = rays.SensorGrid.from_beams(jnp.asarray(beams), pixel_offset=0.5,
                                          angle_offset=0.123)
        w = 2650
        s2w = transforms.se3(
            jnp.asarray(quat.to_rotation_matrix(
                quat.normalize(jnp.array([0.9, 0.1, -0.2, 0.3])))),
            jnp.array([10.0, -3.0, 2.0]))
        rng = 5.0 + jax.random.uniform(KEY, (64, w)) * 40.0
        pts = rays.range_to_points(grid, rng, s2w)
        row, col, r = rays.project_points(grid, pts, transforms.invert_se3(s2w), w)
        ii, jj = jnp.meshgrid(jnp.arange(64.0), jnp.arange(float(w)), indexing="ij")
        np.testing.assert_allclose(r, rng, rtol=1e-4)
        np.testing.assert_allclose(row, ii, atol=2e-2)
        np.testing.assert_allclose(col, jj, atol=2e-2)

    def test_rays_consistent_with_range_to_points(self):
        grid = self._grid()
        s2w = transforms.se3(jnp.eye(3), jnp.array([1.0, 2.0, 3.0]))
        o, d = rays.range_rays(grid, 1030, s2w)
        rng = jnp.full((66, 1030), 12.5)
        pts = rays.range_to_points(grid, rng, s2w)
        np.testing.assert_allclose(o + d * 12.5, pts, atol=1e-4)


class TestTransforms:
    def test_invert_se3(self):
        r = quat.to_rotation_matrix(quat.normalize(jax.random.normal(KEY, (4,))))
        m = transforms.se3(r, jnp.array([1.0, -2.0, 0.5]))
        np.testing.assert_allclose(m @ transforms.invert_se3(m),
                                   np.eye(4), atol=1e-6)

    def test_forward_fill(self):
        present = np.array([False, True, False, False, True, False])
        t = np.arange(6, dtype=np.float32)[:, None].repeat(3, 1)
        r = np.arange(6, dtype=np.float32)[:, None].repeat(4, 1)
        tf, rf = transforms.forward_fill_poses(present, t, r)
        assert tf[2, 0] == 1 and tf[3, 0] == 1 and tf[5, 0] == 4
        assert tf[0, 0] == 1  # back-filled from first observation
        assert rf[2, 0] == 1


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestCamera:
    def test_pinhole_depth_of_frontal_plane(self):
        import numpy as np
        from lidar_rt_tpu.core.camera import Camera, render_debug
        from lidar_rt_tpu.ops.composite import SurfelBundle

        # opaque wall at z=+5 in camera frame (camera at origin, identity)
        n = 25
        g = np.linspace(-2, 2, 5)
        xx, yy = np.meshgrid(g, g)
        means = np.stack([xx.ravel(), yy.ravel(), np.full(n, 5.0)],
                         1).astype(np.float32)
        quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
        sh = np.zeros((n, 16, 3), np.float32)
        sh[:, 0] = 0.5
        bundle = SurfelBundle(
            means=jnp.asarray(means), rotations=jnp.asarray(quats),
            scales=jnp.full((n, 2), 1.0), opacities=jnp.full((n,), 0.99),
            sh=jnp.asarray(sh))
        cam = Camera(image_height=16, image_width=16, fovx=0.6, fovy=0.6,
                     r=np.eye(3), t=np.zeros(3))
        out = render_debug(bundle, cam, active_sh_degree=0, chunk=128)
        d = np.asarray(out["depth"])
        acc = np.asarray(out["accum"])
        center = d[8, 8] / max(acc[8, 8], 1e-6)
        assert abs(center - 5.0) < 0.2
