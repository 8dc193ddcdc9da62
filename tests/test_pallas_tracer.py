"""Pallas forward kernel vs the scanned-JAX tracer (tile-order semantics).

On CPU these run through the Pallas interpreter (conftest forces the cpu
platform); on TPU the same tests exercise the compiled Mosaic kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_rt_tpu.core import rays as rays_lib
from lidar_rt_tpu.ops import pallas_tracer, tracer
from lidar_rt_tpu.ops.binning import TileConfig
from lidar_rt_tpu.ops.composite import SurfelBundle

# Multi-minute interpret-mode kernel tests: excluded from the fast dev
# tier (`pytest -m "not slow"`); the full suite remains the CI gate.
pytestmark = pytest.mark.slow

GRID = rays_lib.SensorGrid.from_bounds(16, (-0.3, 0.1))
WIDTH = 256
S2W = jnp.eye(4)
BG = jnp.array([0.0, 0.0, 1.0])

TILE = TileConfig(tile_h=16, tile_w=128, max_per_tile=128)
P_CFG = pallas_tracer.PallasTraceConfig(tile=TILE, ray_block=512)
J_CFG = tracer.TraceConfig(tile=TILE, exact_order=False, tile_batch=2)


def _bundle(n=60, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.normal(scale=3.0, size=(n, 3)) + np.array([12.0, 0, 0])
    sh = np.zeros((n, 16, 3), np.float32)
    sh[:, 0, :] = rng.uniform(-0.5, 1.0, size=(n, 3))
    sh[:, 1:4, :] = rng.normal(scale=0.1, size=(n, 3, 3)).astype(np.float32)
    return SurfelBundle(
        means=jnp.asarray(means, jnp.float32),
        rotations=jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        scales=jnp.asarray(rng.uniform(0.2, 0.6, (n, 2)), jnp.float32),
        opacities=jnp.asarray(rng.uniform(0.4, 0.95, (n,)), jnp.float32),
        sh=jnp.asarray(sh))


class TestPallasForward:
    @pytest.mark.parametrize("seed", [0, 3])
    def test_matches_jax_tile_order(self, seed):
        bundle = _bundle(seed=seed)
        ref = tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, J_CFG)
        out = pallas_tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, P_CFG)
        np.testing.assert_allclose(np.asarray(out.channels),
                                   np.asarray(ref.channels), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.accum_weights),
                                   np.asarray(ref.accum_weights), atol=2e-4)

    def test_sh_degree_masking(self):
        bundle = _bundle(seed=1)
        out0 = pallas_tracer.trace(bundle, GRID, WIDTH, S2W, BG, 0, P_CFG)
        out3 = pallas_tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, P_CFG)
        ref0 = tracer.trace(bundle, GRID, WIDTH, S2W, BG, 0, J_CFG)
        np.testing.assert_allclose(np.asarray(out0.channels),
                                   np.asarray(ref0.channels), atol=2e-4)
        # degree must actually matter (directional SH coeffs are nonzero)
        assert np.abs(np.asarray(out0.channels[..., 0])
                      - np.asarray(out3.channels[..., 0])).max() > 1e-4

    def test_empty_scene(self):
        bundle = _bundle(4)._replace(opacities=jnp.zeros((4,)))
        out = pallas_tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, P_CFG)
        np.testing.assert_allclose(np.asarray(out.channels[..., 8]), 1.0)
        np.testing.assert_allclose(np.asarray(out.accum_weights), 0.0)

    def test_fast_math_plumbing(self):
        """fast_math must thread TraceConfig -> PallasTraceConfig and run
        fwd+bwd.  In interpret mode (CPU) matmul precision is a no-op, so
        outputs/grads are identical to the default path; on TPU the knob
        relaxes only the channel/gradient contractions (intersections stay
        exact-f32 VPU), so channels agree to the bf16-rounding bound."""
        bundle = _bundle(seed=2)
        cfg_fast = tracer.TraceConfig(tile=TILE, engine="pallas",
                                      fast_math=True)
        cfg_ref = tracer.TraceConfig(tile=TILE, engine="pallas")

        def loss(b, cfg):
            out = tracer.trace(b, GRID, WIDTH, S2W, BG, 3, cfg)
            return jnp.sum(out.channels[..., :4] ** 2)

        l_f, g_f = jax.value_and_grad(loss)(bundle, cfg_fast)
        l_r, g_r = jax.value_and_grad(loss)(bundle, cfg_ref)
        tol = 1e-6 if jax.default_backend() != "tpu" else 3e-2
        np.testing.assert_allclose(float(l_f), float(l_r), rtol=tol)
        gf = np.concatenate([np.ravel(x) for x in jax.tree.leaves(g_f)])
        gr = np.concatenate([np.ravel(x) for x in jax.tree.leaves(g_r)])
        cos = float(np.dot(gf, gr)
                    / max(np.linalg.norm(gf) * np.linalg.norm(gr), 1e-12))
        assert cos > 0.999

    def test_exact_order_matches_jax(self):
        """Pallas exact_order=True must reproduce the jax engine's exact
        per-ray depth ordering (reference k-buffer, forward.cu:312-356),
        including on scenes where tile order and depth order disagree."""
        # Deep stack of overlapping surfels at graded depths: tile-order
        # (nearest-center) and per-ray depth order differ at the edges.
        bundle = _bundle(seed=21)
        p_exact = pallas_tracer.PallasTraceConfig(tile=TILE, ray_block=512,
                                                  exact_order=True)
        j_exact = tracer.TraceConfig(tile=TILE, exact_order=True,
                                     tile_batch=2, engine="jax")
        out = pallas_tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, p_exact)
        ref = tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, j_exact)
        np.testing.assert_allclose(np.asarray(out.channels),
                                   np.asarray(ref.channels), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.accum_weights),
                                   np.asarray(ref.accum_weights), atol=2e-4)
        # ordering must actually matter on this scene: tile-order differs
        tile_order = pallas_tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3,
                                         P_CFG)
        assert np.abs(np.asarray(tile_order.channels[..., 3])
                      - np.asarray(ref.channels[..., 3])).max() > 1e-3

    def test_exact_order_grads_match_jax(self):
        bundle = _bundle(40, seed=22)
        p_exact = pallas_tracer.PallasTraceConfig(tile=TILE, ray_block=512,
                                                  exact_order=True)
        j_exact = tracer.TraceConfig(tile=TILE, exact_order=True,
                                     tile_batch=2, engine="jax")

        def loss_p(b):
            out = pallas_tracer.trace(b, GRID, WIDTH, S2W, BG, 3, p_exact)
            return (jnp.sum(out.channels[..., 3] ** 2) * 1e-3
                    + jnp.sum(out.channels[..., 0:3] ** 2)
                    + jnp.sum(out.channels[..., 8]))

        def loss_j(b):
            out = tracer.trace(b, GRID, WIDTH, S2W, BG, 3, j_exact)
            return (jnp.sum(out.channels[..., 3] ** 2) * 1e-3
                    + jnp.sum(out.channels[..., 0:3] ** 2)
                    + jnp.sum(out.channels[..., 8]))

        g_p = jax.grad(loss_p)(bundle)
        g_j = jax.grad(loss_j)(bundle)
        for name in ("means", "rotations", "scales", "opacities", "sh"):
            a = np.asarray(getattr(g_p, name))
            b = np.asarray(getattr(g_j, name))
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, atol=3e-3,
                                       err_msg=name)

    def test_min_depth_matches_jax(self):
        """Multi-return re-trace: per-ray min_depth must gate hits exactly
        as on the jax engine (second-echo semantics, forward.cu:282-291)."""
        bundle = _bundle(seed=4)
        r1 = tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, J_CFG)
        min2 = jnp.maximum(r1.channels[..., 3], 0.0) + 1.0
        ref = tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, J_CFG,
                           min_depth=min2)
        out = pallas_tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, P_CFG,
                                  min_depth=min2)
        np.testing.assert_allclose(np.asarray(out.channels),
                                   np.asarray(ref.channels), atol=2e-4)
        # the second return must differ from the first (gating is active)
        assert np.abs(np.asarray(ref.channels[..., 3])
                      - np.asarray(r1.channels[..., 3])).max() > 0.1

    def test_min_depth_grads_match_jax(self):
        bundle = _bundle(40, seed=9)
        md = jnp.full((GRID.height, WIDTH), 11.0)

        def loss_p(b):
            out = pallas_tracer.trace(b, GRID, WIDTH, S2W, BG, 3, P_CFG,
                                      min_depth=md)
            return jnp.sum(out.channels[..., 0:4] ** 2)

        def loss_j(b):
            out = tracer.trace(b, GRID, WIDTH, S2W, BG, 3, J_CFG,
                               min_depth=md)
            return jnp.sum(out.channels[..., 0:4] ** 2)

        g_p = jax.grad(loss_p)(bundle)
        g_j = jax.grad(loss_j)(bundle)
        scale = np.abs(np.asarray(g_j.means)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(g_p.means) / scale,
                                   np.asarray(g_j.means) / scale, atol=2e-3)


class TestPallasBackward:
    def _loss(self, trace_fn):
        def loss(bundle):
            out = trace_fn(bundle)
            return (jnp.sum(out.channels[..., 3] ** 2) * 1e-3
                    + jnp.sum(out.channels[..., 0:3] ** 2)
                    + jnp.sum(out.channels[..., 5:8] * 0.1)
                    + jnp.sum(out.channels[..., 8]))
        return loss

    @pytest.mark.parametrize("seed", [0, 5])
    def test_grads_match_jax_path(self, seed):
        bundle = _bundle(50, seed=seed)

        def run_pallas(b):
            return pallas_tracer.trace(b, GRID, WIDTH, S2W, BG, 3, P_CFG)

        def run_jax(b):
            return tracer.trace(b, GRID, WIDTH, S2W, BG, 3, J_CFG)

        g_p = jax.grad(self._loss(run_pallas))(bundle)
        g_j = jax.grad(self._loss(run_jax))(bundle)
        for name in ("means", "rotations", "scales", "opacities", "sh"):
            a = np.asarray(getattr(g_p, name))
            b = np.asarray(getattr(g_j, name))
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, atol=3e-3,
                                       err_msg=name)

    def test_grad_depth_only(self):
        # isolate the depth channel chain (direct dt + d_alpha suffix terms)
        bundle = _bundle(30, seed=7)

        def loss_p(b):
            out = pallas_tracer.trace(b, GRID, WIDTH, S2W, BG, 3, P_CFG)
            return jnp.sum(out.channels[..., 3])

        def loss_j(b):
            out = tracer.trace(b, GRID, WIDTH, S2W, BG, 3, J_CFG)
            return jnp.sum(out.channels[..., 3])

        g_p = jax.grad(loss_p)(bundle)
        g_j = jax.grad(loss_j)(bundle)
        scale = np.abs(np.asarray(g_j.means)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(g_p.means) / scale,
                                   np.asarray(g_j.means) / scale, atol=2e-3)


class TestPallasBandRendering:
    def test_band_matches_full_slice(self):
        """Column-band rendering (the ray-sharding unit) must equal the
        corresponding slice of a full render."""
        bundle = _bundle(50, seed=11)
        full = pallas_tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, P_CFG)
        band_w = 128
        for off in (0, 128):
            band = pallas_tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3,
                                       P_CFG, col_offset=off,
                                       render_width=band_w)
            np.testing.assert_allclose(
                np.asarray(band.channels),
                np.asarray(full.channels[:, off:off + band_w]), atol=2e-4)

    def test_band_accum_sums_to_full(self):
        bundle = _bundle(50, seed=12)
        full = pallas_tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, P_CFG)
        acc = sum(
            np.asarray(pallas_tracer.trace(
                bundle, GRID, WIDTH, S2W, BG, 3, P_CFG, col_offset=off,
                render_width=128).accum_weights)
            for off in (0, 128))
        np.testing.assert_allclose(acc, np.asarray(full.accum_weights),
                                   atol=2e-4)


class TestExactPair:
    """Cross-chunk exact ordering at K = 256 (the flagship budget): the
    256-lane two-chunk pair sort must reproduce the jax engine's global
    per-ray depth order (reference forward.cu:312-356) — both kernels."""

    TILE256 = TileConfig(tile_h=16, tile_w=128, max_per_tile=256)

    def test_forward_matches_jax_exact(self):
        bundle = _bundle(220, seed=31)
        p = pallas_tracer.PallasTraceConfig(tile=self.TILE256,
                                            ray_block=512, exact_order=True)
        j = tracer.TraceConfig(tile=self.TILE256, exact_order=True,
                               tile_batch=2, engine="jax")
        out = pallas_tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, p)
        ref = tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, j)
        np.testing.assert_allclose(np.asarray(out.channels),
                                   np.asarray(ref.channels), atol=3e-4)
        np.testing.assert_allclose(np.asarray(out.accum_weights),
                                   np.asarray(ref.accum_weights), atol=3e-4)
        # the scene must actually have cross-chunk inversions: tile order
        # (and the per-chunk-only sort at K=256) disagree with exact
        p_tile = pallas_tracer.PallasTraceConfig(tile=self.TILE256,
                                                 ray_block=512)
        tile_order = pallas_tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3,
                                         p_tile)
        assert np.abs(np.asarray(tile_order.channels[..., 3])
                      - np.asarray(ref.channels[..., 3])).max() > 1e-3

    def test_backward_matches_jax_exact(self):
        bundle = _bundle(160, seed=32)
        p = pallas_tracer.PallasTraceConfig(tile=self.TILE256,
                                            ray_block=512, exact_order=True)
        j = tracer.TraceConfig(tile=self.TILE256, exact_order=True,
                               tile_batch=2, engine="jax")

        def loss(trace_fn, cfg):
            def f(b):
                out = trace_fn(b, GRID, WIDTH, S2W, BG, 3, cfg)
                return (jnp.sum(out.channels[..., 3] ** 2) * 1e-3
                        + jnp.sum(out.channels[..., 0:3] ** 2)
                        + jnp.sum(out.channels[..., 8]))
            return f

        g_p = jax.grad(loss(pallas_tracer.trace, p))(bundle)
        g_j = jax.grad(loss(tracer.trace, j))(bundle)
        for name in ("means", "rotations", "scales", "opacities", "sh"):
            a = np.asarray(getattr(g_p, name))
            b = np.asarray(getattr(g_j, name))
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, atol=3e-3,
                                       err_msg=name)

    def test_tail_carry_with_exact_pair(self):
        """init_trans (tail re-trace carry) composes with the pair sort:
        raw-transmittance output and channels match the jax exact engine
        when a non-trivial initial transmittance is supplied."""
        bundle = _bundle(150, seed=33)
        rng = np.random.default_rng(4)
        t0 = jnp.asarray(rng.uniform(0.3, 1.0, (16, WIDTH)), jnp.float32)
        p = pallas_tracer.PallasTraceConfig(tile=self.TILE256,
                                            ray_block=512, exact_order=True)
        j = tracer.TraceConfig(tile=self.TILE256, exact_order=True,
                               tile_batch=2, engine="jax")
        out = pallas_tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, p,
                                  init_trans=t0)
        ref = tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, j,
                           init_trans=t0)
        np.testing.assert_allclose(np.asarray(out.channels),
                                   np.asarray(ref.channels), atol=3e-4)
        np.testing.assert_allclose(np.asarray(out.raw_trans),
                                   np.asarray(ref.raw_trans), atol=3e-4)


class TestCacheFwd:
    """cache_fwd: forward banks bf16 per-pair (signed gated alpha,
    exclusive transmittance) residuals and the backward decodes them
    instead of replaying the forward (pallas_backward cache path).
    Forward CHANNELS must be bitwise unchanged (the residuals are extra
    outputs); gradients agree with the replay backward to bf16-rounding
    tolerance (the fast_math class)."""

    CACHE = pallas_tracer.PallasTraceConfig(tile=TILE, ray_block=512,
                                            cache_fwd=True)

    def test_forward_unchanged(self):
        bundle = _bundle(seed=2)
        a = pallas_tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, P_CFG)
        b = pallas_tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, self.CACHE)
        np.testing.assert_array_equal(np.asarray(a.channels),
                                      np.asarray(b.channels))
        np.testing.assert_array_equal(np.asarray(a.accum_weights),
                                      np.asarray(b.accum_weights))

    @pytest.mark.parametrize("seed", [0, 5])
    def test_grads_match_replay(self, seed):
        bundle = _bundle(50, seed=seed)

        def loss(cfg):
            def f(b):
                out = pallas_tracer.trace(b, GRID, WIDTH, S2W, BG, 3, cfg)
                return (jnp.sum(out.channels[..., 3] ** 2) * 1e-3
                        + jnp.sum(out.channels[..., 0:3] ** 2)
                        + jnp.sum(out.channels[..., 5:8] * 0.1)
                        + jnp.sum(out.channels[..., 8])
                        + jnp.sum(out.raw_trans))
            return f

        g_c = jax.grad(loss(self.CACHE))(bundle)
        g_r = jax.grad(loss(P_CFG))(bundle)
        for name in ("means", "rotations", "scales", "opacities", "sh"):
            a = np.asarray(getattr(g_c, name))
            b = np.asarray(getattr(g_r, name))
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, atol=1.5e-2,
                                       err_msg=name)
            # bf16 rounding must not destroy direction: cosine ~ 1
            cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)
                                   + 1e-12)
            assert cos > 0.999, (name, cos)

    def test_multichunk_cache(self):
        """K=256 tile-order: the chunk-carry (gw prefix, alive latch)
        must chain identically through the decoded path."""
        tile = TileConfig(tile_h=16, tile_w=128, max_per_tile=256)
        cfgs = [pallas_tracer.PallasTraceConfig(tile=tile, ray_block=512,
                                                cache_fwd=c)
                for c in (True, False)]
        bundle = _bundle(200, seed=11)

        def loss(cfg):
            def f(b):
                out = pallas_tracer.trace(b, GRID, WIDTH, S2W, BG, 3, cfg)
                return (jnp.sum(out.channels[..., 0:4] ** 2)
                        + jnp.sum(out.channels[..., 8]))
            return f

        g_c = jax.grad(loss(cfgs[0]))(bundle)
        g_r = jax.grad(loss(cfgs[1]))(bundle)
        for name in ("means", "scales", "opacities", "sh"):
            a = np.asarray(getattr(g_c, name))
            b = np.asarray(getattr(g_r, name))
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, atol=1.5e-2,
                                       err_msg=name)

    def test_exact_order_rejected(self):
        with pytest.raises(ValueError):
            pallas_tracer.PallasTraceConfig(tile=TILE, ray_block=512,
                                            exact_order=True,
                                            cache_fwd=True)
