"""Isolate per-grid-step overhead in the forward kernel.

The kernel microbench measured a 6-op/pair body at 9.6 G pairs/s vs the
full ~40-op body at 7.9 — per-pair ops are nearly free, which points at a
fixed per-grid-step cost (DMA issue chains / semaphores / block epilogues),
not VPU issue.  This probe times the flagship forward at constant total
pair count while varying the number of grid steps:

  * ray_block 512 vs 256 vs 128 (2x / 4x the rb axis steps, same pairs)
  * tile_h 8 vs 16 vs 32 (fewer tiles, same rays and K budget per ray —
    pair count constant, tile axis steps shrink)

If time tracks grid steps rather than pairs, the lever is more work per
step (larger blocks), not cheaper per-pair math.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/grid_overhead_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402
from lidar_rt_tpu.core import rays as rays_lib  # noqa: E402
from lidar_rt_tpu.ops import pallas_tracer  # noqa: E402
from lidar_rt_tpu.ops.binning import TileConfig  # noqa: E402

H, W = bench.H, bench.W
ITERS = 20


def timed(pcfg, bundle, grid, s2w, bg, label):
    def step(carry, _):
        b = bundle._replace(opacities=bundle.opacities + carry * 1e-30)
        out = pallas_tracer.trace(b, grid, W, s2w, bg, 3, pcfg)
        return out.accum_weights * 1e-30 + carry * 0.0, None

    @jax.jit
    def run(bundle):
        out, _ = jax.lax.scan(step, jnp.zeros_like(bundle.opacities), None,
                              length=ITERS)
        return jnp.sum(out)

    r = jax.block_until_ready(run(bundle))
    t0 = time.perf_counter()
    r = jax.block_until_ready(run(bundle))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    tiles_y = -(-H // pcfg.tile.tile_h)
    tiles_x = -(-W // pcfg.tile.tile_w)
    steps = tiles_y * tiles_x * (
        pcfg.tile.tile_h * pcfg.tile.tile_w // pcfg.ray_block)
    pairs = tiles_y * tiles_x * pcfg.tile.tile_h * pcfg.tile.tile_w \
        * pcfg.tile.max_per_tile
    print(f"{label:36s} {dt:7.2f} ms   {steps:5d} steps  "
          f"{pairs / dt * 1e3 / 1e9:5.1f} G pairs/s  "
          f"{dt / steps * 1e3:6.1f} us/step", flush=True)
    return dt


def main() -> None:
    grid = rays_lib.SensorGrid.from_bounds(H, (-0.31, 0.04),
                                           pixel_offset=0.5)
    s2w = jnp.eye(4).at[2, 3].set(2.0)
    bg = jnp.array([0.0, 0.0, 1.0])
    bundle = bench.street_scene_bundle(bench.N_SURFELS)

    def cfg(th, tw, k, rb, fast=True):
        return pallas_tracer.PallasTraceConfig(
            tile=TileConfig(tile_h=th, tile_w=tw, max_per_tile=k,
                            binner="hier", approx_topk=True),
            ray_block=rb, exact_order=False, fast_math=fast)

    # Constant pairs, varying rb-axis step count.
    timed(cfg(8, 128, 256, 512), bundle, grid, s2w, bg,
          "8x128 K=256 rb=512 (flagship)")
    timed(cfg(8, 128, 256, 256), bundle, grid, s2w, bg,
          "8x128 K=256 rb=256 (2x steps)")
    timed(cfg(8, 128, 256, 128), bundle, grid, s2w, bg,
          "8x128 K=256 rb=128 (4x steps)")
    # Constant pairs, varying tile axis step count (K budget per ray same).
    timed(cfg(16, 128, 256, 512), bundle, grid, s2w, bg,
          "16x128 K=256 rb=512 (1/2 tiles)")
    timed(cfg(32, 128, 256, 512), bundle, grid, s2w, bg,
          "32x128 K=256 rb=512 (1/4 tiles)")
    timed(cfg(8, 256, 256, 512), bundle, grid, s2w, bg,
          "8x256 K=256 rb=512 (1/2 tiles, wide)")
    # Half the pairs for reference scaling.
    timed(cfg(8, 128, 128, 512), bundle, grid, s2w, bg,
          "8x128 K=128 rb=512 (1/2 pairs)")


if __name__ == "__main__":
    main()
