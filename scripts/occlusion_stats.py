"""Occlusion-cull design measurement on the bench street scene.

Hypothesis (round-4 perf step change): a ray stops mattering past the depth
where its transmittance crosses T_MIN (the reference's ray-tracing stop,
forward.cu:253-257).  A candidate whose conservative NEAR range lies past
every tile ray's latch depth contributes zero weight and zero gradient, so
the binner can cull it — recovering the "each ray touches only its own
hits" property the BVH gives the reference, and (if the post-cull demand
fits) letting the flagship budget drop from K=256 to K=128 (2x on both
kernels).

Measures, per tile size (8/4/2 x 128):
  - fraction of tiles with a finite latch bound (every ray saturated),
  - per-tile BINNED candidate counts (box footprint, no K cap) before and
    after the occlusion cull (near_range <= tile latch + margin),
  - per-tile unique GATE-PASSERS of the selected K=256 after the cull
    (the true post-cull K demand).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/occlusion_stats.py
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
from lidar_rt_tpu.ops.binning import (TileConfig, bin_surfels,  # noqa: E402
                                      cutoff_radius, footprint_bounds)

H, W = bench.H, bench.W
TILE = TileConfig(tile_h=8, tile_w=128, max_per_tile=256, binner="hier",
                  approx_topk=True)
MARGIN = 0.5     # meters added to the latch bound (staleness headroom)


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
    def latch_and_demand(bundle):
        """Per-ray latch depth (exact depth-ordered composite of the K=256
        binning) + per-tile near-range of every selected candidate."""
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

        # Conservative near range per surfel: center range minus the
        # opacity-adaptive cutoff radius (isotropic — a lower bound on any
        # ray's intersection depth with the support disk).
        p_s = bundle.means @ w2s[:3, :3].T + w2s[:3, 3]
        rng_c = jnp.linalg.norm(p_s, axis=-1)
        near = rng_c - cutoff_radius(bundle.scales, bundle.opacities,
                                     TILE.cutoff_eps)

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
            alpha = jnp.where(ok, alpha_raw, 0.0)

            key = jnp.where(ok, t, jnp.inf)
            order = jnp.argsort(key, axis=-1)
            alpha_o = jnp.take_along_axis(alpha, order, axis=-1)
            t_o = jnp.take_along_axis(t, order, axis=-1)
            t_excl = jnp.cumprod(1.0 - alpha_o, axis=-1) \
                / jnp.maximum(1.0 - alpha_o, 1e-12)
            # latch: first (= min depth) gated hit whose post-transmittance
            # falls below T_MIN.
            latched = (alpha_o > 0.0) \
                & (t_excl * (1.0 - alpha_o) < geometry.T_MIN)
            latch_t = jnp.min(jnp.where(latched, t_o, jnp.inf),
                              axis=-1)                         # (R,)
            return latch_t, near[idx], ok

        b = 8
        nb = -(-t_total // b)
        pad_t = nb * b - t_total

        def pad(x):
            return jnp.concatenate([x, x[:1].repeat(pad_t, 0)], 0) \
                if pad_t else x

        xs = (pad(dirs_t).reshape(nb, b, th * tw, 3),
              pad(idx_c).reshape(nb, b, k),
              pad(a.valid).reshape(nb, b, k))

        def body(_, batch):
            return None, jax.vmap(tile_fn)(batch)

        _, (latch, near_k, ok_k) = jax.lax.scan(body, None, xs)
        latch = latch.reshape(nb * b, th * tw)[:t_total]
        near_k = near_k.reshape(nb * b, k)[:t_total]
        ok_k = ok_k.reshape(nb * b, th * tw, k)[:t_total]
        return latch, near_k, ok_k

    t0 = time.time()
    latch_t, near_k, ok_k = jax.block_until_ready(latch_and_demand(bundle))
    latch = np.asarray(latch_t)                      # (T, R)
    near_k = np.asarray(near_k)                      # (T, K)
    ok_k = np.asarray(ok_k)                          # (T, R, K)
    print(f"latch pass in {time.time() - t0:.1f} s")

    # Un-tile latch to (H, W) image.
    latch_img = (latch.reshape(tiles_y, tiles_x, th, tw)
                 .transpose(0, 2, 1, 3)
                 .reshape(tiles_y * th, tiles_x * tw))[:H, :W]
    sat = np.isfinite(latch_img)
    print(f"saturated rays: {sat.mean():.3f}  "
          f"latch depth p50 {np.median(latch_img[sat]):.1f} m  "
          f"p90 {np.percentile(latch_img[sat], 90):.1f} m")

    # Per-tile gate demand after the cull at the flagship tile (8x128).
    lb_tile = latch.max(axis=1) + MARGIN                        # (T,)
    keep = near_k <= lb_tile[:, None]                           # (T, K)
    gate_any = ok_k.any(axis=1)                                 # (T, K)
    demand_pre = gate_any.sum(axis=1)
    demand_post = (gate_any & keep).sum(axis=1)
    finite = np.isfinite(lb_tile)
    print(f"\n8x128 tiles: finite latch bound on {finite.mean():.3f} of "
          f"tiles")

    def describe(name, v):
        print(f"{name}: mean {v.mean():.1f}  p50 {np.percentile(v, 50):.0f}"
              f"  p90 {np.percentile(v, 90):.0f}"
              f"  p99 {np.percentile(v, 99):.0f}  max {v.max()}  "
              f"frac<=128 {np.mean(v <= 128):.4f}")

    describe("unique gate-passers / tile, pre-cull ", demand_pre)
    describe("unique gate-passers / tile, post-cull", demand_post)

    # BINNED (box footprint, no K cap) counts pre/post cull per tile size.
    row_lo, row_hi, col_c, col_half, rng, live = footprint_bounds(
        grid, W, w2s, bundle.means, bundle.scales, bundle.opacities,
        TILE, rotations=bundle.rotations)
    near_all = np.asarray(rng - cutoff_radius(
        bundle.scales, bundle.opacities, TILE.cutoff_eps))
    row_lo, row_hi = np.asarray(row_lo), np.asarray(row_hi)
    col_c, col_half = np.asarray(col_c), np.asarray(col_half)
    live = np.asarray(live)

    for th2 in (8, 4, 2):
        ty2 = H // th2
        lb = (latch_img.reshape(ty2, th2, tiles_x, tw)
              .max(axis=(1, 3)) + MARGIN)                      # (ty2, tx)
        t_row_lo = np.arange(ty2, dtype=np.float64) * th2
        t_row_hi = np.minimum(t_row_lo + th2, H)
        sec_c = np.arange(tiles_x, dtype=np.float64) * tw + tw / 2.0

        row_in = ((row_lo[None, :] <= t_row_hi[:, None] - 0.5)
                  & (row_hi[None, :] >= t_row_lo[:, None] - 0.5))
        d = np.abs((col_c[None, :] - sec_c[:, None] + W / 2.0) % W
                   - W / 2.0)
        col_in = d <= (col_half[None, :] + tw / 2.0 + 0.5)
        pre = np.zeros((ty2, tiles_x), np.int64)
        post = np.zeros((ty2, tiles_x), np.int64)
        c = 16384
        for s in range(0, n, c):
            sl = slice(s, s + c)
            ov = (row_in[:, None, sl] & col_in[None, :, sl]
                  & live[None, None, sl])
            pre += ov.sum(-1)
            post += (ov & (near_all[None, None, sl]
                           <= lb[:, :, None])).sum(-1)
        pre, post = pre.ravel(), post.ravel()
        fin = np.isfinite(lb.ravel())
        print(f"\n{th2}x128 tiles (finite bound {fin.mean():.3f}):")
        describe("  binned/tile pre-cull ", pre)
        describe("  binned/tile post-cull", post)
        print(f"  total binned pairs {pre.sum()} -> {post.sum()} "
              f"({post.sum() / max(pre.sum(), 1):.3f}x)")


if __name__ == "__main__":
    main()
