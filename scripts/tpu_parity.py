"""TPU-compiled parity gate: pallas (Mosaic) vs jax engine, on-chip.

Catches compiled-path regressions that interpret-mode CI cannot see
(Mosaic lowering bugs, MXU precision). Renders one street scene with both
engines on the real chip and checks channel parity and gradient cosines.
Exit code 1 on failure; prints one line per check.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from lidar_rt_tpu.core import rays as rays_lib
from lidar_rt_tpu.ops import tracer as tracer_lib
from lidar_rt_tpu.ops.binning import TileConfig

H, W = 32, 512
N = 8192


def main() -> int:
    grid = rays_lib.SensorGrid.from_bounds(H, (-0.31, 0.04),
                                           pixel_offset=0.5)
    s2w = jnp.eye(4).at[2, 3].set(2.0)
    bg = jnp.array([0.0, 0.0, 1.0])
    bundle = bench.street_scene_bundle(N)
    # --fast: validate fast_math (1-pass bf16 channel/gradient matmuls)
    # against the f32 jax engine at its expected looser tolerance
    # (~4e-3 absolute channel deviation; intersections stay exact-f32).
    fast = "--fast" in sys.argv
    ch_tol = 2e-2 if fast else 1e-3
    ok = True
    # K=128 exact exercises the single-chunk bitonic sort; K=256 exact
    # exercises the 256-lane two-chunk pair sort (globally exact ordering
    # at the flagship budget) in forward AND backward.
    for k_budget, exact in ((128, False), (128, True), (256, True)):
        tile = TileConfig(tile_h=16, tile_w=128, max_per_tile=k_budget,
                          binner="hier", approx_topk=False)
        cfg_p = tracer_lib.TraceConfig(tile=tile, exact_order=exact,
                                       ray_block=512, engine="pallas",
                                       fast_math=fast)
        cfg_j = tracer_lib.TraceConfig(tile=tile, exact_order=exact,
                                       tile_batch=4, engine="jax")

        def loss(b, cfg):
            out = tracer_lib.trace(b, grid, W, s2w, bg, 3, cfg)
            return (jnp.sum(jnp.abs(out.channels[..., 3])) * 1e-3
                    + jnp.sum(out.channels[..., 0:3] ** 2)
                    + jnp.sum(out.channels[..., 8])), out.channels

        (l_p, ch_p), g_p = jax.value_and_grad(
            lambda b: loss(b, cfg_p), has_aux=True)(bundle)
        (l_j, ch_j), g_j = jax.value_and_grad(
            lambda b: loss(b, cfg_j), has_aux=True)(bundle)
        ch_err = float(jnp.max(jnp.abs(ch_p - ch_j)))
        line = [("fast " if fast else "") + f"K={k_budget} exact={exact}: "
                f"chan max err {ch_err:.2e}"]
        this_ok = ch_err < ch_tol
        for name in ("means", "rotations", "scales", "opacities", "sh"):
            a = np.asarray(getattr(g_p, name)).ravel()
            b = np.asarray(getattr(g_j, name)).ravel()
            cos = float(np.dot(a, b)
                        / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-30))
            line.append(f"cos({name})={cos:.6f}")
            this_ok &= cos > 0.999
        print(("PASS " if this_ok else "FAIL ") + "  ".join(line),
              flush=True)
        ok &= this_ok
    print("TPU PARITY " + ("OK" if ok else "FAILED"), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
