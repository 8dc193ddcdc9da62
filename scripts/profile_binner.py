"""Binner internals: stage costs and candidate-demand statistics.

Times footprint_bounds alone and full bin_surfels for a grid of configs
(in-jit scan methodology, bench.py), and prints per-tile candidate-count
stats (mean / p95 / max valid candidates, truncation) — the data that
decides how small tile_h x K can go before truncation hurts quality.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_binner.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402
from lidar_rt_tpu.core import rays as rays_lib  # noqa: E402
from lidar_rt_tpu.core import transforms  # noqa: E402
from lidar_rt_tpu.ops.binning import (TileConfig, bin_surfels,  # noqa: E402
                                      footprint_bounds)

H, W = bench.H, bench.W
ITERS = 20

# (label, tile_h, tile_w, K, binner, cf, macro_cols, approx)
CONFIGS = [
    ("hier  8x128 K256 cf8", 8, 128, 256, "hier", 8, 0, True),
    ("hier  8x128 K256 cf4", 8, 128, 256, "hier", 4, 0, True),
    ("hier  8x128 K256 cf8 m1024", 8, 128, 256, "hier", 8, 1024, True),
    ("hier  4x128 K128 cf8", 4, 128, 128, "hier", 8, 0, True),
    ("hier  4x128 K256 cf8", 4, 128, 256, "hier", 8, 0, True),
    ("hier  2x128 K128 cf8", 2, 128, 128, "hier", 8, 0, True),
    ("hier  1x128 K128 cf8", 1, 128, 128, "hier", 8, 0, True),
    ("sort  8x128 K256", 8, 128, 256, "sort", 8, 0, True),
]


def timed(fn, bundle):
    def step(carry, _):
        # (N,) coupling: a (N, 3) means coupling costs ~0.5 ms/iter.
        b = bundle._replace(opacities=bundle.opacities + carry * 1e-30)
        return fn(b) * 1e-30, None

    @jax.jit
    def run(bundle):
        out, _ = jax.lax.scan(step, jnp.zeros(()), None, length=ITERS)
        return out

    r = run(bundle)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    jax.block_until_ready(run(bundle))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main() -> None:
    grid = rays_lib.SensorGrid.from_bounds(H, (-0.31, 0.04),
                                           pixel_offset=0.5)
    s2w = jnp.eye(4).at[2, 3].set(2.0)
    bundle = bench.street_scene_bundle(bench.N_SURFELS)
    w2s = transforms.invert_se3(s2w)

    cfg0 = TileConfig(tile_h=8, tile_w=128, max_per_tile=256, binner="hier",
                      approx_topk=True)

    def s_bounds(b):
        out = footprint_bounds(grid, W, w2s, b.means, b.scales,
                               b.opacities, cfg0, rotations=b.rotations)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out)

    print(f"footprint_bounds            {timed(s_bounds, bundle):7.2f} ms",
          flush=True)

    for label, th, tw, k, binner, cf, macro, approx in CONFIGS:
        cfg = TileConfig(tile_h=th, tile_w=tw, max_per_tile=k,
                         binner=binner, approx_topk=approx,
                         coarse_factor=cf, macro_cols=macro)

        def s_bin(b, cfg=cfg):
            a = bin_surfels(grid, W, w2s, b.means, b.scales, b.opacities,
                            cfg, rotations=b.rotations)
            return jnp.sum(a.index).astype(jnp.float32)

        @jax.jit
        def stats(b, cfg=cfg):
            a = bin_surfels(grid, W, w2s, b.means, b.scales, b.opacities,
                            cfg, rotations=b.rotations)
            cnt = jnp.sum(a.valid, axis=1)
            return cnt, a.truncated

        try:
            dt = timed(s_bin, bundle)
            cnt, trunc = jax.device_get(stats(bundle))
            print(f"{label:28s} {dt:7.2f} ms   cand/tile mean {cnt.mean():6.1f}"
                  f" p95 {np.percentile(cnt, 95):6.0f} max {cnt.max():5d}"
                  f"   trunc tiles {int((trunc > 0).sum()):4d}"
                  f" sum {int(trunc.sum()):7d}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label:28s} FAIL {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
