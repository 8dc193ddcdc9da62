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

GRID = rays_lib.SensorGrid.from_bounds(16, (-0.3, 0.1))
WIDTH = 256
S2W = jnp.eye(4)
BG = jnp.array([0.0, 0.0, 1.0])

TILE = TileConfig(tile_h=16, tile_w=128, max_per_tile=128)
P_CFG = pallas_tracer.PallasTraceConfig(tile=TILE, ray_block=1024)
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
