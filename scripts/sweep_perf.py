"""Kernel config sweep on the real chip: tile shape x K x ray_block.

Measures forward and fwd+bwd wall time of the Pallas tracer on the
street-scene bench workload (bench.py), for candidate-reduction configs.
Prints one line per config; run detached (first compiles are slow).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402  (repo root on PYTHONPATH)
from lidar_rt_tpu.core import rays as rays_lib  # noqa: E402
from lidar_rt_tpu.ops import tracer as tracer_lib  # noqa: E402
from lidar_rt_tpu.ops.binning import TileConfig, bin_surfels  # noqa: E402
from lidar_rt_tpu.core import transforms  # noqa: E402

H, W = bench.H, bench.W
ITERS = 16

CONFIGS = [
    # (binner, tile_h, tile_w, K, ray_block, approx_topk, macro_cols,
    #  coarse_factor)
    ("hier", 8, 128, 256, 512, True, 0, 8),  # round-2 quality champion
    ("hier", 8, 128, 256, 256, True, 0, 8),
    ("hier", 8, 128, 256, 128, True, 0, 8),
    ("hier", 4, 128, 128, 512, True, 0, 8),
    ("hier", 8, 64, 128, 512, True, 0, 8),
]


def main() -> None:
    grid = rays_lib.SensorGrid.from_bounds(H, (-0.31, 0.04),
                                           pixel_offset=0.5)
    s2w = jnp.eye(4).at[2, 3].set(2.0)
    bg = jnp.array([0.0, 0.0, 1.0])
    bundle = bench.street_scene_bundle(bench.N_SURFELS)

    for binner, th, tw, k, rb, approx, macro, cf in CONFIGS:
        cfg = tracer_lib.TraceConfig(
            tile=TileConfig(tile_h=th, tile_w=tw, max_per_tile=k,
                            binner=binner, approx_topk=approx,
                            macro_cols=macro, coarse_factor=cf),
            exact_order=False, ray_block=rb,
            fast_math="--fast" in sys.argv)

        @jax.jit
        def fwd(bundle, cfg=cfg):
            out = tracer_lib.trace(bundle, grid, W, s2w, bg, 3, cfg)
            return out.channels

        @jax.jit
        def fwd_bwd(bundle, cfg=cfg):
            def loss(b):
                out = tracer_lib.trace(b, grid, W, s2w, bg, 3, cfg)
                return (jnp.sum(jnp.abs(out.channels[..., 3])) * 1e-3
                        + jnp.sum(out.channels[..., 0] ** 2))
            l, g = jax.value_and_grad(loss)(bundle)
            return l, g.means

        @jax.jit
        def bin_only(bundle, cfg=cfg):
            w2s = transforms.invert_se3(s2w)
            a = bin_surfels(grid, W, w2s, bundle.means, bundle.scales,
                            bundle.opacities, cfg.tile,
                            rotations=bundle.rotations)
            return a.index.sum(), a.valid.sum()

        def scan_timed(body):
            """In-jit scan timing (bench.py methodology): device runs
            iterations back-to-back, (N,) opacity coupling."""

            def step(carry, _):
                b = bundle._replace(opacities=bundle.opacities
                                    + carry * 1e-30)
                return body(b) * 1e-30, None

            @jax.jit
            def run(b):
                out, _ = jax.lax.scan(step, jnp.zeros(()), None,
                                      length=ITERS)
                return out

            jax.block_until_ready(run(bundle))
            t0 = time.perf_counter()
            jax.block_until_ready(run(bundle))
            return (time.perf_counter() - t0) / ITERS * 1e3

        try:
            def bench_fn(f):
                def body(b):
                    out = f(b)
                    return sum(jnp.sum(o).astype(jnp.float32)
                               for o in jax.tree.leaves(out))
                return scan_timed(body)

            _, v = jax.block_until_ready(bin_only(bundle))
            t_f = bench_fn(fwd)
            t_fb = bench_fn(fwd_bwd)
            t_b = bench_fn(bin_only)
            mray = H * W / (t_fb / 1e3) / 1e6
            mean_cnt = float(v) / ((-(-H // th)) * (-(-W // tw)))
            tag = ("approx" if approx else "exact") + (f"/m{macro}" if macro else "") + f"/cf{cf}"
            print(f"{binner}/{tag} {th}x{tw} K={k} rb={rb}: "
                  f"fwd {t_f:.1f} ms  fwd+bwd {t_fb:.1f} ms "
                  f"({mray:.1f} Mray/s)  bin {t_b:.1f} ms  "
                  f"mean cand/tile {mean_cnt:.0f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{binner} {th}x{tw} K={k} rb={rb}: FAIL "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
