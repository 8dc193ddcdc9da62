"""Tests for the dense oracle renderer against analytic scenes and an
independent per-ray python reference loop that mimics the reference CUDA
kernel's control flow (forward.cu:195-292) literally."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_rt_tpu.core import quaternions as quat
from lidar_rt_tpu.core import sh as sh_lib
from lidar_rt_tpu.ops import composite, geometry


def make_bundle(means, quats, scales, opacities, intensity=0.7,
                hit_logit=2.0, drop_logit=-2.0):
    n = means.shape[0]
    sh = np.zeros((n, 16, 3), np.float32)
    sh[:, 0, 0] = (intensity - 0.5) / sh_lib.C0
    sh[:, 0, 1] = (hit_logit - 0.5) / sh_lib.C0
    sh[:, 0, 2] = (drop_logit - 0.5) / sh_lib.C0
    return composite.SurfelBundle(
        means=jnp.asarray(means, jnp.float32),
        rotations=jnp.asarray(quats, jnp.float32),
        scales=jnp.asarray(scales, jnp.float32),
        opacities=jnp.asarray(opacities, jnp.float32),
        sh=jnp.asarray(sh),
    )


BG = jnp.array([0.0, 0.0, 1.0])
IDENTITY_Q = [1.0, 0.0, 0.0, 0.0]


def facing_x_quat():
    """Quaternion whose R[:, 2] (surfel normal) is +x: rotate +z to +x."""
    return [np.cos(np.pi / 4), 0.0, np.sin(np.pi / 4), 0.0]


class TestSingleSurfel:
    def test_center_ray_depth_and_alpha(self):
        b = make_bundle(np.array([[10.0, 0, 0]]), np.array([facing_x_quat()]),
                        np.array([[0.5, 0.5]]), np.array([0.9]))
        dirs = jnp.array([[1.0, 0.0, 0.0]])
        out = composite.render_dense(b, jnp.zeros(3), dirs, BG)
        a = 0.9  # G = 1 on the center ray
        np.testing.assert_allclose(out.depth, [a * 10.0], rtol=1e-5)
        np.testing.assert_allclose(out.accum, [a], rtol=1e-5)
        np.testing.assert_allclose(out.final_transmittance, [1 - a], rtol=1e-5)
        np.testing.assert_allclose(out.color[0, 0], a * 0.7, rtol=1e-5)
        # drop logit channel picks up the background through (1 - a).
        np.testing.assert_allclose(out.color[0, 2], a * (-2.0) + (1 - a) * 1.0,
                                   rtol=1e-4)
        np.testing.assert_allclose(out.accum_weights, [a], rtol=1e-5)

    def test_offset_ray_gaussian_falloff(self):
        s = 0.5
        b = make_bundle(np.array([[10.0, 0, 0]]), np.array([facing_x_quat()]),
                        np.array([[s, s]]), np.array([0.9]))
        # Ray hitting the plane 0.5 m off-center -> u = 1 sigma.
        d = np.array([10.0, 0.5, 0.0])
        d = d / np.linalg.norm(d)
        out = composite.render_dense(b, jnp.zeros(3), jnp.asarray(d)[None], BG)
        # Intersection with plane x=10 is at y = 0.5 exactly.
        g = np.exp(-0.5 * (0.5 / s) ** 2)
        np.testing.assert_allclose(out.accum, [0.9 * g], rtol=1e-4)

    def test_tilted_surfel_plane_intersection(self):
        # Normal 45 deg between x and y; plane through (10, 0, 0).
        q = quat.from_rotation_matrix(jnp.asarray(np.stack([
            np.array([0., 0., 1.]),
            np.array([1., -1., 0.]) / np.sqrt(2),
            np.array([1., 1., 0.]) / np.sqrt(2)], axis=1), dtype=np.float32))
        b = make_bundle(np.array([[10.0, 0, 0]]), np.array([q]),
                        np.array([[5.0, 5.0]]), np.array([0.9]))
        d = np.array([1.0, 0.2, 0.0])
        d = d / np.linalg.norm(d)
        out = composite.render_dense(b, jnp.zeros(3), jnp.asarray(d)[None], BG)
        # t from n.(mu - o) / n.d with n = (1,1,0)/sqrt(2).
        n = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
        t_expect = n @ np.array([10.0, 0, 0]) / (n @ d)
        w = float(out.accum[0])
        np.testing.assert_allclose(out.depth[0] / w, t_expect, rtol=1e-4)

    def test_min_depth_skip(self):
        b = make_bundle(np.array([[0.1, 0, 0]]), np.array([facing_x_quat()]),
                        np.array([[0.5, 0.5]]), np.array([0.9]))
        out = composite.render_dense(b, jnp.zeros(3),
                                     jnp.array([[1.0, 0, 0]]), BG)
        np.testing.assert_allclose(out.accum, [0.0], atol=1e-7)
        np.testing.assert_allclose(out.final_transmittance, [1.0], atol=1e-7)

    def test_behind_ray_invalid(self):
        b = make_bundle(np.array([[-10.0, 0, 0]]), np.array([facing_x_quat()]),
                        np.array([[0.5, 0.5]]), np.array([0.9]))
        out = composite.render_dense(b, jnp.zeros(3),
                                     jnp.array([[1.0, 0, 0]]), BG)
        np.testing.assert_allclose(out.accum, [0.0], atol=1e-7)

    def test_empty_scene_is_background(self):
        b = make_bundle(np.array([[10.0, 0, 0]]), np.array([facing_x_quat()]),
                        np.array([[0.5, 0.5]]), np.array([1e-5]))  # ~invisible
        out = composite.render_dense(b, jnp.zeros(3),
                                     jnp.array([[1.0, 0, 0]]), BG)
        np.testing.assert_allclose(out.color[0], BG, atol=1e-6)


class TestCompositing:
    def test_two_surfels_front_to_back(self):
        b = make_bundle(
            np.array([[5.0, 0, 0], [10.0, 0, 0]]),
            np.array([facing_x_quat()] * 2),
            np.array([[0.5, 0.5]] * 2), np.array([0.5, 0.8]))
        out = composite.render_dense(b, jnp.zeros(3),
                                     jnp.array([[1.0, 0, 0]]), BG)
        w1, w2 = 0.5, 0.8 * (1 - 0.5)
        np.testing.assert_allclose(out.depth, [w1 * 5 + w2 * 10], rtol=1e-5)
        np.testing.assert_allclose(out.accum_weights, [w1, w2], rtol=1e-5)

    def test_order_given_vs_ray_t(self):
        # Surfels listed far-first; "ray_t" must still composite near-first.
        b = make_bundle(
            np.array([[10.0, 0, 0], [5.0, 0, 0]]),
            np.array([facing_x_quat()] * 2),
            np.array([[0.5, 0.5]] * 2), np.array([0.8, 0.5]))
        d = jnp.array([[1.0, 0, 0]])
        out_sorted = composite.render_dense(b, jnp.zeros(3), d, BG, order="ray_t")
        out_given = composite.render_dense(b, jnp.zeros(3), d, BG, order="given")
        np.testing.assert_allclose(out_sorted.accum_weights,
                                   [0.8 * 0.5, 0.5], rtol=1e-5)
        np.testing.assert_allclose(out_given.accum_weights,
                                   [0.8, 0.5 * 0.2], rtol=1e-5)

    def test_early_termination(self):
        # 8 near-opaque surfels: transmittance hits T_MIN and the tail must
        # not contribute.
        n = 8
        b = make_bundle(
            np.stack([np.array([5.0 + i, 0, 0]) for i in range(n)]),
            np.array([facing_x_quat()] * n),
            np.array([[0.5, 0.5]] * n), np.full(n, 0.98))
        out = composite.render_dense(b, jnp.zeros(3),
                                     jnp.array([[1.0, 0, 0]]), BG)
        acc = np.asarray(out.accum_weights)
        # T after k composited hits is 0.02^k: hit 0 -> 0.02, hit 1 -> 4e-4,
        # hit 2 would give 8e-6 < T_MIN so it and everything behind is
        # dropped and final T stays 4e-4 (reference break, forward.cu:253).
        assert acc[0] > 0 and acc[1] > 0
        np.testing.assert_allclose(acc[2:], 0.0, atol=1e-8)
        np.testing.assert_allclose(out.final_transmittance, [4e-4], rtol=1e-3)


def python_reference_loop(bundle, origin, dirs, bg, sh_degree=3):
    """Literal float64 re-statement of forward.cu:195-305 per-ray control
    flow (sorted hits, skips, early break), independent of the vectorized
    formulation."""
    means = np.asarray(bundle.means, np.float64)
    rots = np.asarray(quat.to_rotation_matrix(bundle.rotations), np.float64)
    scales = np.asarray(bundle.scales, np.float64)
    opac = np.asarray(bundle.opacities, np.float64)
    shc = np.asarray(bundle.sh, np.float64)
    o = np.asarray(origin, np.float64)
    out = np.zeros((dirs.shape[0], 9))
    accum_g = np.zeros(means.shape[0])
    for r, d in enumerate(np.asarray(dirs, np.float64)):
        basis = np.asarray(sh_lib.basis(jnp.asarray(d[None]), sh_degree))[0]
        hits = []
        for g in range(means.shape[0]):
            w1, w2, n = rots[g, :, 0], rots[g, :, 1], rots[g, :, 2]
            qd = n @ d
            if abs(qd) <= 1e-12:
                continue
            p = n @ (means[g] - o)
            if p == 0:
                continue
            t = p / qd
            if t < geometry.DEPTH_MIN:
                continue
            x = o + t * d
            u = w1 @ (x - means[g]) / scales[g, 0]
            v = w2 @ (x - means[g]) / scales[g, 1]
            gauss = np.exp(-0.5 * (u * u + v * v))
            alpha = min(0.99, opac[g] * gauss)
            if alpha < 1.0 / 255.0:
                continue
            sign = 1.0 if p < 0 else -1.0
            hits.append((t, g, alpha, sign * n))
        hits.sort(key=lambda h: h[0])
        T = 1.0
        C = np.zeros(3)
        D = 0.0
        W = 0.0
        N = np.zeros(3)
        for t, g, alpha, sn in hits:
            test_T = T * (1 - alpha)
            if test_T < 1e-4:
                break
            w = alpha * T
            color = basis @ shc[g] + 0.5
            color[0] = max(color[0], 0.0)
            C += w * color
            D += w * t
            W += w
            N += w * sn
            accum_g[g] += w
            T = test_T
        out[r, 0:3] = C + T * np.asarray(bg)
        out[r, 3] = D
        out[r, 4] = W
        out[r, 5:8] = N
        out[r, 8] = T
    return out, accum_g


class TestAgainstPythonLoop:
    def test_random_scene_matches(self):
        rng = np.random.RandomState(7)
        n = 60
        means = rng.uniform(-8, 8, (n, 3)) + np.array([15.0, 0, 0])
        quats = quat.normalize(jnp.asarray(rng.randn(n, 4), jnp.float32))
        scales = np.exp(rng.uniform(-1.5, 0.5, (n, 2)))
        opac = 1 / (1 + np.exp(-rng.randn(n) * 2))
        sh = rng.randn(n, 16, 3) * 0.3
        b = composite.SurfelBundle(
            jnp.asarray(means, jnp.float32), jnp.asarray(quats),
            jnp.asarray(scales, jnp.float32), jnp.asarray(opac, jnp.float32),
            jnp.asarray(sh, jnp.float32))
        dirs = rng.randn(40, 3)
        dirs[:, 0] = np.abs(dirs[:, 0]) + 1.0
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs = jnp.asarray(dirs, jnp.float32)

        out = composite.render_dense(b, jnp.zeros(3), dirs, BG)
        ref_out, ref_accum = python_reference_loop(b, np.zeros(3), dirs, BG)
        np.testing.assert_allclose(out.channels, ref_out, atol=5e-4)
        np.testing.assert_allclose(out.accum_weights, ref_accum, atol=5e-4)


class TestGradients:
    def test_grads_finite_and_nonzero(self):
        rng = np.random.RandomState(3)
        n = 12
        b = composite.SurfelBundle(
            jnp.asarray(rng.uniform(-3, 3, (n, 3)) + np.array([10.0, 0, 0]),
                        jnp.float32),
            quat.normalize(jnp.asarray(rng.randn(n, 4), jnp.float32)),
            jnp.asarray(np.exp(rng.uniform(-1, 0.5, (n, 2))), jnp.float32),
            jnp.asarray(1 / (1 + np.exp(-rng.randn(n))), jnp.float32),
            jnp.asarray(rng.randn(n, 16, 3) * 0.3, jnp.float32))
        dirs = rng.randn(16, 3)
        dirs[:, 0] = np.abs(dirs[:, 0]) + 1.0
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs = jnp.asarray(dirs, jnp.float32)

        def loss(bundle):
            out = composite.render_dense(bundle, jnp.zeros(3), dirs, BG)
            return (jnp.sum(out.depth ** 2) + jnp.sum(out.color ** 2)
                    + jnp.sum(out.final_transmittance))

        grads = jax.grad(loss)(b)
        for name, g in grads._asdict().items():
            assert bool(jnp.all(jnp.isfinite(g))), name
        assert float(jnp.abs(grads.means).max()) > 0
        assert float(jnp.abs(grads.scales).max()) > 0
        assert float(jnp.abs(grads.rotations).max()) > 0
        assert float(jnp.abs(grads.opacities).max()) > 0
        assert float(jnp.abs(grads.sh).max()) > 0

    def test_finite_difference_depth_wrt_mean(self):
        # Move a single facing surfel along x; d(depth)/d(mu_x) ~ alpha.
        def depth_of(mu_x):
            b = make_bundle(np.array([[1.0, 0, 0]]) * 0,
                            np.array([facing_x_quat()]),
                            np.array([[0.5, 0.5]]), np.array([0.9]))
            b = b._replace(means=jnp.array([[mu_x, 0.0, 0.0]]))
            out = composite.render_dense(b, jnp.zeros(3),
                                         jnp.array([[1.0, 0, 0]]), BG)
            return out.depth[0]

        g = jax.grad(depth_of)(10.0)
        eps = 1e-2
        fd = (depth_of(10.0 + eps) - depth_of(10.0 - eps)) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=1e-3)
        np.testing.assert_allclose(g, 0.9, rtol=1e-3)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
