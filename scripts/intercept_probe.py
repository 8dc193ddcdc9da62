"""Decompose the Pallas kernels' K-INDEPENDENT cost ("intercept") on chip.

Round-3 stage profiling showed fwd/bwd kernel time = ~1.65 ms fixed
+ ~1.2 ms per 128 candidate lanes (PERF_NOTES).  Pair-count cuts
(narrow tiles at K=128) therefore bottom out on the fixed part; this
probe measures where it lives by timing the PRODUCTION kernels with the
candidate prep done once outside the loop and these ablations:

  fwd_full      real counts               = intercept + chunk bodies
  fwd_cnt0      all counts zero           = per-step + per-ray + post-loop
                                            (chunk bodies pl.when-skipped)
  bwd_full / bwd_cnt0   same for the backward custom_vjp call
  untile        trace_forward minus the kernel (tile->raster relayout +
                accum scatter), by subtraction

Sweep K via BENCH_K, tile via BENCH_TILE_H/BENCH_TILE_W, rb via
BENCH_RAY_BLOCK (bench.py env knobs).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/intercept_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402
from lidar_rt_tpu.core import rays as rays_lib  # noqa: E402
from lidar_rt_tpu.core import sh as sh_lib  # noqa: E402
from lidar_rt_tpu.core import transforms  # noqa: E402
from lidar_rt_tpu.ops import pallas_tracer  # noqa: E402
from lidar_rt_tpu.ops.binning import TileConfig, bin_surfels  # noqa: E402

H, W = bench.H, bench.W
ITERS = 20

TILE = TileConfig(tile_h=bench._TILE_H, tile_w=bench._TILE_W,
                  max_per_tile=bench._K, binner="hier", approx_topk=True)
PCFG = pallas_tracer.PallasTraceConfig(tile=TILE, ray_block=bench._RAY_BLOCK,
                                       exact_order=False, fast_math=True)


def timed(fn, *args, label=""):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label:24s} {dt:7.3f} ms", flush=True)
    return dt


def main() -> None:
    grid = rays_lib.SensorGrid.from_bounds(H, (-0.31, 0.04),
                                           pixel_offset=0.5)
    s2w = jnp.eye(4).at[2, 3].set(2.0)
    bundle = bench.street_scene_bundle(bench.N_SURFELS)
    w2s = transforms.invert_se3(s2w)

    a = bin_surfels(grid, W, w2s, bundle.means, bundle.scales,
                    bundle.opacities, TILE, rotations=bundle.rotations)
    origin, dirs = rays_lib.range_rays(grid, W, s2w)
    axes, plane, inv_scale, opac, sign, sh = \
        pallas_tracer._prepare_tile_inputs(bundle, origin, a.index, a.valid)
    mask = (jnp.asarray(sh_lib._DEGREE_OF_COEFF) <= 3).astype(sh.dtype)
    sh = sh * mask[None, None, :, None]

    th, tw = TILE.tile_h, TILE.tile_w
    tiles_y, tiles_x = TILE.num_tiles(H, W)
    t_total = tiles_y * tiles_x
    rays_per_tile = th * tw
    hp, wp = tiles_y * th, tiles_x * tw
    dirs_p = pallas_tracer._take_cols_mod(
        pallas_tracer._pad_rows(dirs, hp), 0, wp, W)
    dirs_t = (dirs_p.reshape(tiles_y, th, tiles_x, tw, 3)
              .transpose(0, 2, 1, 3, 4)
              .reshape(t_total, rays_per_tile, 3))
    drows_t = dirs_t.transpose(0, 2, 1)
    from lidar_rt_tpu.ops import geometry
    mind_t = jnp.full((t_total, rays_per_tile, 1), geometry.DEPTH_MIN)
    t0_t = jnp.ones((t_total, rays_per_tile, 1))
    cnt_real = jnp.sum(a.valid, axis=1, dtype=jnp.float32)[:, None]
    cnt_zero = jnp.zeros_like(cnt_real)
    rb = PCFG.ray_block

    n_steps = t_total * max(rays_per_tile // rb, 1)
    print(f"tile {th}x{tw} K={TILE.max_per_tile} rb={rb}: {t_total} tiles, "
          f"{n_steps} grid steps, mean cnt "
          f"{float(jnp.mean(cnt_real)):.0f}")

    def fwd(cnt):
        def run(carry, _):
            op = opac + carry * 1e-30
            chans, accum = pallas_tracer._pallas_core(
                rb, False, True, cnt, dirs_t, drows_t, mind_t, t0_t,
                axes, plane, inv_scale, op, sign, sh)
            return jnp.sum(chans) * 1e-30, None

        out, _ = jax.lax.scan(run, jnp.zeros(()), None, length=ITERS)
        return out

    def bwd(cnt):
        def loss(op):
            chans, accum = pallas_tracer._pallas_core(
                rb, False, True, cnt, dirs_t, drows_t, mind_t, t0_t,
                axes, plane, inv_scale, op, sign, sh)
            return jnp.sum(chans)

        def run(carry, _):
            op = opac + carry * 1e-30
            g = jax.grad(loss)(op)
            return jnp.sum(g) * 1e-30, None

        out, _ = jax.lax.scan(run, jnp.zeros(()), None, length=ITERS)
        return out

    f_full = timed(fwd, cnt_real, label="fwd_full")
    f_cnt0 = timed(fwd, cnt_zero, label="fwd_cnt0")
    # bwd() differentiates through fwd too: subtract the fwd time.
    fb_full = timed(bwd, cnt_real, label="fwd+bwd_full")
    fb_cnt0 = timed(bwd, cnt_zero, label="fwd+bwd_cnt0")

    def full_trace(op):
        b = bundle._replace(opacities=jnp.max(op))  # shape hack: unused
        img, accum = pallas_tracer.trace_forward(
            bundle, grid, W, s2w, 3, PCFG, assignment=a)
        return jnp.sum(img) + jnp.sum(accum)

    def untile_run(_):
        def run(carry, _x):
            img, accum = pallas_tracer.trace_forward(
                bundle._replace(opacities=bundle.opacities + carry * 1e-30),
                grid, W, s2w, 3, PCFG, assignment=a)
            return jnp.sum(img) * 1e-30, None

        out, _ = jax.lax.scan(run, jnp.zeros(()), None, length=ITERS)
        return out

    f_tr = timed(untile_run, jnp.zeros(()), label="trace_forward")

    print()
    print(f"fwd chunk bodies        {f_full - f_cnt0:7.3f} ms")
    print(f"fwd intercept (cnt0)    {f_cnt0:7.3f} ms")
    print(f"bwd_full                {fb_full - f_full:7.3f} ms")
    print(f"bwd chunk bodies        {(fb_full - f_full) - (fb_cnt0 - f_cnt0):7.3f} ms")
    print(f"bwd intercept (cnt0)    {fb_cnt0 - f_cnt0:7.3f} ms")
    print(f"prep+untile (trace_forward - fwd_full)  {f_tr - f_full:7.3f} ms")


if __name__ == "__main__":
    main()
