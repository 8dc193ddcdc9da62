"""Stage decomposition of pallas_tracer.trace_forward on the chip."""
import time
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from lidar_rt_tpu.core import rays as rays_lib, sh as sh_lib, transforms
from lidar_rt_tpu.ops import pallas_tracer as pt
from lidar_rt_tpu.ops.binning import TileConfig, bin_surfels
from lidar_rt_tpu.ops import geometry

H, W = bench.H, bench.W
ITERS = 20

grid = rays_lib.SensorGrid.from_bounds(H, (-0.31, 0.04), pixel_offset=0.5)
s2w = jnp.eye(4).at[2, 3].set(2.0)
bundle = bench.street_scene_bundle(bench.N_SURFELS)
tile = TileConfig(tile_h=8, tile_w=128, max_per_tile=256, binner="hier",
                  approx_topk=True)
cfg = pt.PallasTraceConfig(tile=tile, ray_block=512)


def timeit(name, f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:24s}: {(time.perf_counter() - t0) / ITERS * 1e3:7.2f} ms",
          flush=True)
    return out


@jax.jit
def run_bin(bundle):
    w2s = transforms.invert_se3(s2w)
    return bin_surfels(grid, W, w2s, bundle.means, bundle.scales,
                       bundle.opacities, tile, rotations=bundle.rotations)


@jax.jit
def run_prep(bundle, assignment):
    th, tw = tile.tile_h, tile.tile_w
    tiles_y, tiles_x = tile.num_tiles(H, W)
    t_total = tiles_y * tiles_x
    rays_per_tile = th * tw
    origin, dirs = rays_lib.range_rays(grid, W, s2w)
    dirs_p = pt._take_cols_mod(pt._pad_rows(dirs, tiles_y * th), 0,
                               tiles_x * tw, W)
    dirs_t = (dirs_p.reshape(tiles_y, th, tiles_x, tw, 3)
              .transpose(0, 2, 1, 3, 4).reshape(t_total, rays_per_tile, 3))
    drows_t = dirs_t.transpose(0, 2, 1)
    mind_t = jnp.full((t_total, rays_per_tile, 1), geometry.DEPTH_MIN)
    cnt_t = jnp.sum(assignment.valid, axis=1, dtype=jnp.float32)[:, None]
    axes, plane, inv_scale, opac, sign, sh = pt._prepare_tile_inputs(
        bundle, origin, assignment.index, assignment.valid)
    mask = (jnp.asarray(sh_lib._DEGREE_OF_COEFF) <= 3).astype(sh.dtype)
    sh = sh * mask[None, None, :, None]
    return (cnt_t, dirs_t, drows_t, mind_t, axes, plane, inv_scale, opac,
            sign, sh)


@jax.jit
def run_kernel(inputs):
    return pt._core_fwd_call(512, False, *inputs)


@jax.jit
def run_full(bundle):
    return pt.trace_forward(bundle, grid, W, s2w, 3, cfg)


assignment = timeit("bin", run_bin, bundle)
inputs = timeit("prep(gathers+basis)", run_prep, bundle, assignment)
out = timeit("kernel", run_kernel, inputs)
timeit("trace_forward total", run_full, bundle)
