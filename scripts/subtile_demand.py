"""True per-subtile gate demand on the bench street scene.

For every sub-tile shape of the flagship 8x128 binning tile, counts the
UNIQUE gate-passing candidates (of the tile's selected K=256) per sub-tile
— the K budget a kernel tiled at that shape actually needs.  This is the
design input for the finer-tile flagship: pairs/ray == K, so the smallest
shape whose p99.9 demand fits K=128 halves both kernels vs K=256.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/subtile_demand.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402
from lidar_rt_tpu.core import quaternions as quat_lib  # noqa: E402
from lidar_rt_tpu.core import rays as rays_lib  # noqa: E402
from lidar_rt_tpu.core import transforms  # noqa: E402
from lidar_rt_tpu.ops import geometry  # noqa: E402
from lidar_rt_tpu.ops.binning import TileConfig, bin_surfels  # noqa: E402

H, W = bench.H, bench.W
TILE = TileConfig(tile_h=8, tile_w=128, max_per_tile=256, binner="hier",
                  approx_topk=True)
SHAPES = [(8, 128), (4, 128), (2, 128), (1, 128),
          (8, 64), (4, 64), (2, 64), (8, 32), (4, 32), (2, 32)]


def main() -> None:
    grid = rays_lib.SensorGrid.from_bounds(H, (-0.31, 0.04),
                                           pixel_offset=0.5)
    s2w = jnp.eye(4).at[2, 3].set(2.0)
    bundle = bench.street_scene_bundle(bench.N_SURFELS)
    w2s = transforms.invert_se3(s2w)
    k = TILE.max_per_tile
    th, tw = TILE.tile_h, TILE.tile_w
    tiles_y, tiles_x = TILE.num_tiles(H, W)
    t_total = tiles_y * tiles_x
    n = bundle.means.shape[0]

    @jax.jit
    def demand(bundle):
        a = bin_surfels(grid, W, w2s, bundle.means, bundle.scales,
                        bundle.opacities, TILE, rotations=bundle.rotations)
        origin, dirs = rays_lib.range_rays(grid, W, s2w)
        row_idx = jnp.clip(jnp.arange(tiles_y * th), 0, H - 1)
        col_idx = jnp.mod(jnp.arange(tiles_x * tw), W)
        dirs_t = (dirs[row_idx][:, col_idx]
                  .reshape(tiles_y, th, tiles_x, tw, 3)
                  .transpose(0, 2, 1, 3, 4)
                  .reshape(t_total, th * tw, 3))
        rot = quat_lib.to_rotation_matrix(bundle.rotations)
        frames = geometry.build_frames(bundle.means, rot, origin)
        idx_c = jnp.clip(a.index, 0, n - 1)

        def tile_fn(args):
            dirs_tile, idx, valid = args
            hp = jax.lax.Precision.HIGHEST
            axes = jnp.stack([frames.n[idx], frames.w1[idx],
                              frames.w2[idx]], axis=0)
            prods = jnp.einsum("rc,akc->ark", dirs_tile, axes, precision=hp)
            qd, b_u, b_v = prods[0], prods[1], prods[2]
            safe_qd = jnp.where(jnp.abs(qd) > geometry.DENOM_EPS, qd,
                                geometry.DENOM_EPS)
            p = frames.p[idx]
            t = p[None, :] / safe_qd
            scales_k = bundle.scales[idx]
            u = (frames.a_u[idx][None, :] + t * b_u) / scales_k[None, :, 0]
            v = (frames.a_v[idx][None, :] + t * b_v) / scales_k[None, :, 1]
            g = jnp.exp(-0.5 * (u * u + v * v))
            alpha_raw = jnp.minimum(geometry.ALPHA_MAX,
                                    bundle.opacities[idx][None, :] * g)
            ok = ((t >= geometry.DEPTH_MIN)
                  & (jnp.abs(qd) > geometry.DENOM_EPS)
                  & (p[None, :] != 0.0)
                  & (alpha_raw >= geometry.ALPHA_MIN)
                  & valid[None, :])
            ok_img = ok.reshape(th, tw, k)
            outs = []
            for (h2, w2) in SHAPES:
                blocks = (ok_img.reshape(th // h2, h2, tw // w2, w2, k)
                          .any(axis=(1, 3)))               # (th/h2, tw/w2, k)
                outs.append(blocks.sum(axis=-1).reshape(-1))
            return tuple(outs)

        b = 8
        nb = -(-t_total // b)
        pad_t = nb * b - t_total

        def pad(x):
            return jnp.concatenate([x, x[:1].repeat(pad_t, 0)], 0) \
                if pad_t else x

        xs = (pad(dirs_t).reshape(nb, b, th * tw, 3),
              pad(idx_c).reshape(nb, b, k),
              pad(a.valid).reshape(nb, b, k))

        def body(hists, batch):
            counts = jax.vmap(tile_fn)(batch)
            return tuple(h.at[c.reshape(-1)].add(1)
                         for h, c in zip(hists, counts)), None

        init = tuple(jnp.zeros(k + 1, jnp.int32) for _ in SHAPES)
        hists, _ = jax.lax.scan(body, init, xs)
        return hists

    t0 = time.time()
    hists = jax.block_until_ready(demand(bundle))
    print(f"computed in {time.time() - t0:.1f} s")
    for (h2, w2), h in zip(SHAPES, hists):
        h = np.asarray(h, np.float64)
        tot = h.sum()
        xs = np.arange(len(h))
        mean = (h * xs).sum() / tot
        cum = np.cumsum(h) / tot
        pct = {p: int(np.searchsorted(cum, p / 100.0)) for p in
               (50, 90, 99, 99.9)}
        mx = int(xs[h > 0].max()) if (h > 0).any() else 0
        print(f"{h2:2d}x{w2:3d}: mean {mean:6.1f}  p50 {pct[50]:3d}  "
              f"p90 {pct[90]:3d}  p99 {pct[99]:3d}  p99.9 {pct[99.9]:3d}  "
              f"max {mx:3d}  frac>128 {h[xs > 128].sum() / tot:.4f}  "
              f"frac>64 {h[xs > 64].sum() / tot:.4f}")


if __name__ == "__main__":
    main()
