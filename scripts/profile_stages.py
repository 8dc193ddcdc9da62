"""Stage-level timing of the tracer pipeline on the real chip.

Times each prefix of the pipeline (bin -> +prep -> fwd -> fwd+bwd) with
the in-jit scan methodology from bench.py: ITERS iterations inside one
jit with a carry coupled into the surfel means, so the device runs steps
back-to-back and per-dispatch tunnel latency is excluded.  Stage costs
are the successive differences.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_stages.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402
from lidar_rt_tpu.core import rays as rays_lib  # noqa: E402
from lidar_rt_tpu.core import transforms  # noqa: E402
from lidar_rt_tpu.ops import pallas_tracer  # noqa: E402
from lidar_rt_tpu.ops import tracer as tracer_lib  # noqa: E402
from lidar_rt_tpu.ops.binning import TileConfig, bin_surfels  # noqa: E402

H, W = bench.H, bench.W
ITERS = 20

FAST = "--fast" in sys.argv
# Tile shape follows bench.py's sweep env vars (BENCH_TILE_H / BENCH_K)
# so stage budgets are measured at the same config the bench reports.
TILE = TileConfig(tile_h=bench._TILE_H, tile_w=bench._TILE_W,
                  max_per_tile=bench._K, macro_cols=bench._MACRO,
                  binner="hier", approx_topk=True)
CFG = tracer_lib.TraceConfig(tile=TILE, exact_order=False,
                             ray_block=bench._RAY_BLOCK, fast_math=FAST)
PCFG = pallas_tracer.PallasTraceConfig(tile=TILE, ray_block=bench._RAY_BLOCK,
                                       exact_order=False, fast_math=FAST)


def timed_scan(stage_fn, bundle, label):
    """stage_fn(bundle) -> scalar; scanned ITERS times with coupling."""

    def step(carry, _):
        # Couple through the (N,) opacities: a (N, 3) means coupling costs
        # a measurable 0.5 ms per iteration (lane-dim-3 layout).
        b = bundle._replace(opacities=bundle.opacities + carry * 1e-30)
        return stage_fn(b) * 1e-30 + carry * 0.0, None

    @jax.jit
    def run(bundle):
        out, _ = jax.lax.scan(step, jnp.zeros(()), None, length=ITERS)
        return out

    r = run(bundle)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run(bundle)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label:28s} {dt:7.2f} ms", flush=True)
    return dt


def main() -> None:
    grid = rays_lib.SensorGrid.from_bounds(H, (-0.31, 0.04),
                                           pixel_offset=0.5)
    s2w = jnp.eye(4).at[2, 3].set(2.0)
    bg = jnp.array([0.0, 0.0, 1.0])
    bundle = bench.street_scene_bundle(bench.N_SURFELS)
    w2s = transforms.invert_se3(s2w)

    def s_bin(b):
        a = bin_surfels(grid, W, w2s, b.means, b.scales, b.opacities,
                        TILE, rotations=b.rotations)
        return jnp.sum(a.index).astype(jnp.float32)

    def s_prep(b):
        a = bin_surfels(grid, W, w2s, b.means, b.scales, b.opacities,
                        TILE, rotations=b.rotations)
        origin, _dirs = rays_lib.range_rays(grid, W, s2w)
        parts = pallas_tracer._prepare_tile_inputs(b, origin, a.index,
                                                   a.valid)
        return sum(jnp.sum(p) for p in parts[:3])

    def s_fwd(b):
        out = pallas_tracer.trace(b, grid, W, s2w, bg, 3, PCFG)
        return jnp.sum(out.channels[..., 0])

    def s_fwdbwd(b):
        def loss(bb):
            out = pallas_tracer.trace(bb, grid, W, s2w, bg, 3, PCFG)
            return (jnp.sum(jnp.abs(out.channels[..., 3])) * 1e-3
                    + jnp.sum(out.channels[..., 0] ** 2))

        l, g = jax.value_and_grad(loss)(b)
        return l + jnp.sum(g.means)

    t_bin = timed_scan(s_bin, bundle, "bin")
    t_prep = timed_scan(s_prep, bundle, "bin+prep")
    t_fwd = timed_scan(s_fwd, bundle, "fwd (bin+prep+kernel+untile)")
    t_fb = timed_scan(s_fwdbwd, bundle, "fwd+bwd")
    print(f"\nstages: bin {t_bin:.2f}  prep {t_prep - t_bin:.2f}  "
          f"kernel+untile {t_fwd - t_prep:.2f}  bwd {t_fb - t_fwd:.2f}  "
          f"-> {H * W / (t_fb / 1e3) / 1e6:.1f} Mray/s", flush=True)


if __name__ == "__main__":
    main()
