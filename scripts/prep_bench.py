"""Decompose the prep stage (gathers, basis, frames, dirs tiling)."""
import time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from lidar_rt_tpu.core import rays as rays_lib, sh as sh_lib, transforms
from lidar_rt_tpu.core import quaternions as quat_lib
from lidar_rt_tpu.ops import pallas_tracer as pt
from lidar_rt_tpu.ops import geometry
from lidar_rt_tpu.ops.binning import TileConfig, bin_surfels

H, W = bench.H, bench.W
ITERS = 30
grid = rays_lib.SensorGrid.from_bounds(H, (-0.31, 0.04), pixel_offset=0.5)
s2w = jnp.eye(4).at[2, 3].set(2.0)
bundle = bench.street_scene_bundle(bench.N_SURFELS)
tile = TileConfig(tile_h=8, tile_w=128, max_per_tile=256, binner="hier",
                  approx_topk=True)

tiles_y, tiles_x = tile.num_tiles(H, W)
t_total = tiles_y * tiles_x
th, tw = tile.tile_h, tile.tile_w
rays_per_tile = th * tw


def timeit(name, f, *args):
    outs = [f(*args)]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        outs.append(f(*args))
    jax.block_until_ready(outs)
    print(f"{name:22s}: {(time.perf_counter()-t0)/ITERS*1e3:7.3f} ms",
          flush=True)
    return outs[0]


@jax.jit
def f_bin(bundle):
    w2s = transforms.invert_se3(s2w)
    return bin_surfels(grid, W, w2s, bundle.means, bundle.scales,
                       bundle.opacities, tile, rotations=bundle.rotations)


@jax.jit
def f_dirs(bundle):
    origin, dirs = rays_lib.range_rays(grid, W, s2w)
    row_idx = pt._pad_indices(H, th, wrap=False)
    col_idx = jnp.mod(jnp.arange(-(-W // tw) * tw), W)
    dirs_p = dirs[row_idx][:, col_idx]
    return (dirs_p.reshape(tiles_y, th, tiles_x, tw, 3)
            .transpose(0, 2, 1, 3, 4).reshape(t_total, rays_per_tile, 3))


@jax.jit
def f_basis(dirs_t):
    return sh_lib.basis(dirs_t, 3)


@jax.jit
def f_frames(bundle):
    origin = s2w[:3, 3]
    rot = quat_lib.to_rotation_matrix(bundle.rotations)
    return geometry.build_frames(bundle.means, rot, origin)


@jax.jit
def f_gather(bundle, assignment):
    origin = s2w[:3, 3]
    return pt._prepare_tile_inputs(bundle, origin, assignment.index,
                                   assignment.valid)


@jax.jit
def f_bin_stage0(bundle):
    """Binning stage 0: per-surfel projections + footprint bounds only."""
    from lidar_rt_tpu.ops.binning import footprint_bounds

    w2s = transforms.invert_se3(s2w)
    return footprint_bounds(grid, W, w2s, bundle.means, bundle.scales,
                            bundle.opacities, tile, bundle.rotations)


@jax.jit
def f_bin_stage1(bounds):
    """Hier stage 1 alone: per-sector column top-K_c."""
    from lidar_rt_tpu.ops.binning import _top_k

    row_lo, row_hi, col_c, col_half, rng, live = bounds
    tiles_x = -(-W // tile.tile_w)
    k_c = min(tile.coarse_factor * tile.max_per_tile, rng.shape[0])
    tx = jnp.arange(tiles_x)
    tile_col_c = jnp.mod((tx.astype(jnp.float32) + 0.5) * tile.tile_w,
                         float(W))
    dcol = jnp.abs(col_c[None, :] - tile_col_c[:, None])
    dcol = jnp.minimum(dcol, W - dcol)
    col_overlap = (dcol <= (col_half[None, :] + tile.tile_w / 2.0 + 0.5)) \
        & live[None, :]
    score = jnp.where(col_overlap, rng[None, :], jnp.inf)
    return _top_k(tile, -score, k_c)


assignment = timeit("bin", f_bin, bundle)
bounds = timeit("bin stage0 (bounds)", f_bin_stage0, bundle)
timeit("bin stage1 (topKc)", f_bin_stage1, bounds)
dirs_t = timeit("dirs gather+tile", f_dirs, bundle)
timeit("sh basis", f_basis, dirs_t)
timeit("build_frames (all N)", f_frames, bundle)
timeit("candidate gathers", f_gather, bundle, assignment)
