"""Loss primitives: masked losses, SSIM parity with torch semantics, chamfer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_rt_tpu.ops import chamfer as chamfer_lib
from lidar_rt_tpu.ops import ssim as ssim_lib
from lidar_rt_tpu.train import losses


class TestMaskedPrimitives:
    def test_masked_mean_matches_fancy_indexing(self):
        rng = np.random.default_rng(0)
        a = rng.uniform(size=(16, 32)).astype(np.float32)
        b = rng.uniform(size=(16, 32)).astype(np.float32)
        m = rng.uniform(size=(16, 32)) > 0.5
        got = float(losses.l1(jnp.asarray(a), jnp.asarray(b), jnp.asarray(m)))
        expect = np.abs(a[m] - b[m]).mean()
        assert got == pytest.approx(expect, rel=1e-5)

    def test_psnr(self):
        a = jnp.full((8, 8), 0.5)
        b = jnp.full((8, 8), 0.6)
        assert float(losses.psnr(a, b)) == pytest.approx(20.0, abs=1e-3)

    def test_bce_probs(self):
        p = jnp.array([0.9, 0.1])
        y = jnp.array([1.0, 0.0])
        expect = -np.log(0.9)
        assert float(losses.bce_probs(p, y)) == pytest.approx(expect, rel=1e-5)


class TestSSIM:
    def test_identical_images(self):
        img = jnp.asarray(np.random.default_rng(1).uniform(
            size=(1, 32, 64)).astype(np.float32))
        assert float(ssim_lib.ssim(img, img)) == pytest.approx(1.0, abs=1e-5)

    def test_matches_torch_reference_semantics(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(2)
        a = rng.uniform(size=(1, 24, 48)).astype(np.float32)
        b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(
            np.float32)

        # Reference semantics (loss_utils.py:45-89): 11x11 gaussian sigma
        # 1.5, same padding, grouped conv.
        g = torch.tensor([float(np.exp(-(x - 5) ** 2 / 4.5))
                          for x in range(11)])
        g = (g / g.sum()).unsqueeze(1)
        win = (g @ g.t()).unsqueeze(0).unsqueeze(0)

        def blur(x):
            return F.conv2d(x, win, padding=5, groups=1)

        ta, tb = torch.from_numpy(a)[None], torch.from_numpy(b)[None]
        mu1, mu2 = blur(ta), blur(tb)
        s1 = blur(ta * ta) - mu1 ** 2
        s2 = blur(tb * tb) - mu2 ** 2
        s12 = blur(ta * tb) - mu1 * mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        expect = (((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
                  / ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))).mean()

        got = float(ssim_lib.ssim(jnp.asarray(a), jnp.asarray(b)))
        assert got == pytest.approx(float(expect), abs=1e-5)

    def test_bounded_value_and_grads_out_of_range(self):
        """Variance cancellation on out-of-range inputs must not blow up:
        ssim stays in [-1, 1] and gradients stay finite even for huge
        magnitudes (a mid-training transient once produced a -inf DSSIM
        whose gradient launched parameters to NaN)."""
        rng = np.random.default_rng(3)
        gt = jnp.asarray(rng.uniform(size=(1, 24, 48)).astype(np.float32))
        for scale in (1e3, 1e8, 1e18):
            big = jnp.asarray(
                (rng.uniform(size=(1, 24, 48)) * scale).astype(np.float32))
            val, grad = jax.value_and_grad(
                lambda x: ssim_lib.ssim(x, gt))(big)
            assert -1.0 - 1e-5 <= float(val) <= 1.0 + 1e-5, scale
            assert np.isfinite(np.asarray(grad)).all(), scale


class TestChamfer:
    def test_identical_clouds_zero(self):
        pts = jnp.asarray(np.random.default_rng(3).normal(
            size=(100, 3)).astype(np.float32))
        m = jnp.ones((100,), bool)
        assert float(chamfer_lib.chamfer_distance(pts, m, pts, m)) < 1e-10

    def test_matches_brute_force_with_masks(self):
        rng = np.random.default_rng(4)
        a = rng.normal(size=(70, 3)).astype(np.float32)
        b = rng.normal(size=(130, 3)).astype(np.float32)
        ma = np.arange(70) < 50
        mb = np.arange(130) < 100
        d = float(chamfer_lib.chamfer_distance(
            jnp.asarray(a), jnp.asarray(ma), jnp.asarray(b), jnp.asarray(mb),
            chunk=32))
        av, bv = a[:50], b[:100]
        d2 = np.sum((av[:, None] - bv[None]) ** 2, axis=-1)
        expect = 0.5 * (d2.min(1).mean() + d2.min(0).mean())
        assert d == pytest.approx(expect, rel=1e-4)

    def test_gradient_pulls_clouds_together(self):
        a = jnp.array([[0.0, 0.0, 0.0]])
        b = jnp.array([[1.0, 0.0, 0.0]])
        m = jnp.ones((1,), bool)
        g = jax.grad(lambda x: chamfer_lib.chamfer_distance(x, m, b, m))(a)
        assert float(g[0, 0]) < 0  # move +x toward b

    def test_fscore(self):
        d_ab = jnp.array([0.0004, 0.01])   # sqrt: 0.02, 0.1
        d_ba = jnp.array([0.0001, 0.0009])  # sqrt: 0.01, 0.03
        m = jnp.ones((2,), bool)
        f = float(chamfer_lib.fscore(d_ab, m, d_ba, m, threshold=0.05))
        # precision 0.5, recall 1.0 -> f = 2*0.5/1.5
        assert f == pytest.approx(2 * 0.5 / 1.5, rel=1e-5)


class TestRenderLosses:
    def test_breakdown_and_weights(self):
        rng = np.random.default_rng(5)
        h, w = 16, 32
        depth = jnp.asarray(rng.uniform(1, 50, (h, w)).astype(np.float32))
        gt_depth = depth + 1.0
        inten = jnp.asarray(rng.uniform(size=(h, w)).astype(np.float32))
        gt_inten = inten
        drop = jnp.full((h, w), 0.1)
        mask = jnp.ones((h, w), bool)
        lw = losses.LossWeights()
        out = losses.render_losses(depth, inten, drop, gt_depth, gt_inten,
                                   mask, lw)
        assert float(out.depth) == pytest.approx(0.1 * 1.0, rel=1e-5)
        assert float(out.total) == pytest.approx(
            float(out.depth + out.intensity + out.raydrop + out.cd + out.reg),
            rel=1e-6)

    def test_box_reg_pushes_points_inside(self):
        from lidar_rt_tpu.scene import TrackBuilder, from_points
        pts = jnp.array([[5.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
        asset = from_points(pts, jnp.full((2, 3), 0.5), jax.random.key(0), 4,
                            extent=10.0)
        track = TrackBuilder(1, size=(2.0, 2.0, 2.0)).build()
        loss = losses.box_reg_loss(asset, track)
        assert float(loss) > 0
        g = jax.grad(
            lambda x: losses.box_reg_loss(
                __import__("dataclasses").replace(asset, xyz=x), track)
        )(asset.xyz)
        assert float(g[0, 0]) > 0  # outside point pushed back toward box
        assert float(g[1, 0]) == 0  # inside point gets no box gradient
