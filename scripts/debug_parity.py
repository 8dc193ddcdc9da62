"""Localize the compiled-kernel divergence: pallas (Mosaic) vs jax engine.

Prints per-channel max error + argmax location, the fraction of divergent
pixels, and — with LIDAR_RT_PALLAS_INTERPRET=1 in a second run — whether
the interpreter reproduces it (semantic bug) or not (Mosaic miscompile).
"""

from __future__ import annotations

import os
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

NAMES = ["int", "hit", "drop", "depth", "accum", "nx", "ny", "nz", "T"]


def main() -> int:
    grid = rays_lib.SensorGrid.from_bounds(H, (-0.31, 0.04),
                                           pixel_offset=0.5)
    s2w = jnp.eye(4).at[2, 3].set(2.0)
    bg = jnp.array([0.0, 0.0, 1.0])
    bundle = bench.street_scene_bundle(N)
    tile = TileConfig(tile_h=16, tile_w=128, max_per_tile=128,
                      binner="hier", approx_topk=False)
    cfg_p = tracer_lib.TraceConfig(tile=tile, exact_order=False,
                                   ray_block=512, engine="pallas")
    cfg_j = tracer_lib.TraceConfig(tile=tile, exact_order=False,
                                   tile_batch=4, engine="jax")

    @jax.jit
    def render_p(b):
        return tracer_lib.trace(b, grid, W, s2w, bg, 3, cfg_p).channels

    @jax.jit
    def render_j(b):
        return tracer_lib.trace(b, grid, W, s2w, bg, 3, cfg_j).channels

    ch_p = np.asarray(render_p(bundle))
    ch_j = np.asarray(render_j(bundle))
    err = np.abs(ch_p - ch_j)
    print(f"interpret={os.environ.get('LIDAR_RT_PALLAS_INTERPRET', '0')}")
    for c in range(9):
        e = err[..., c]
        i, j = np.unravel_index(np.argmax(e), e.shape)
        nbad = int((e > 1e-3).sum())
        print(f"ch{c} {NAMES[c]:6s}: max {e.max():.3e} at ({i},{j}) "
              f"p={ch_p[i, j, c]:+.4f} j={ch_j[i, j, c]:+.4f} "
              f"bad_px={nbad}/{e.size}")
    # spatial structure: per-tile max error of the worst channel
    cworst = int(np.argmax(err.reshape(-1, 9).max(0)))
    e = err[..., cworst]
    tiles = e.reshape(H // 16, 16, W // 128, 128).max((1, 3))
    print(f"worst channel {NAMES[cworst]}: per-tile max\n{tiles}")
    # column profile within the worst tile row
    ti, tj = np.unravel_index(np.argmax(tiles), tiles.shape)
    sub = e[ti * 16:(ti + 1) * 16, tj * 128:(tj + 1) * 128]
    colmax = sub.max(0)
    print(f"worst tile ({ti},{tj}): col-max quantiles "
          f"{np.percentile(colmax, [0, 25, 50, 75, 100])}")
    rowmax = sub.max(1)
    print(f"row-max: {rowmax}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
