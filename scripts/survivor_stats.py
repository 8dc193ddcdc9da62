"""Per-ray survivor statistics on the bench street scene.

Measures, for the flagship tile config, how many of each ray's K tile
candidates actually matter:

  n_alpha — pairs passing every alpha gate (alpha >= ALPHA_MIN, t >= DEPTH_MIN,
            valid plane) — the pairs that contribute weight or gradient at all
  n_live  — pairs with nonzero composited weight under depth-ordered
            front-to-back compositing (reference forward.cu:240-257 semantics)

These are the design inputs for per-ray survivor compaction in the pallas
kernel: the per-pair alpha math is unavoidable (it IS the visibility test),
but the scan / channel / backward work only matters for surviving pairs —
if p99(n_alpha) << K, sorting survivors to the front (the existing bitonic
machinery) and compositing a compacted candidate axis cuts that work by
K / K_surv.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/survivor_stats.py
"""

from __future__ import annotations

import functools
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
    def stats(bundle):
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
            # dirs_tile rows are tile-row-major: reshape (th, tw, 3) later
            # for per-row unique-candidate counts.
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
            n_alpha = jnp.sum(ok, axis=-1)                       # (R,)

            key = jnp.where(ok, t, jnp.inf)
            order = jnp.argsort(key, axis=-1)
            alpha_o = jnp.take_along_axis(alpha, order, axis=-1)
            t_excl = jnp.cumprod(1.0 - alpha_o, axis=-1) \
                / jnp.maximum(1.0 - alpha_o, 1e-12)              # exclusive
            live = (t_excl >= geometry.T_MIN) & (alpha_o > 0.0)
            n_live = jnp.sum(live, axis=-1)

            # Per-ROW unique gate-passing candidates: the K budget a
            # 1-row-tile kernel would actually need (union over the row's
            # tw rays of its true alpha gate).
            ok_rows = ok.reshape(TILE.tile_h, TILE.tile_w, k)
            n_row_true = jnp.sum(jnp.any(ok_rows, axis=1), axis=-1)  # (th,)
            # Per-TILE unique gate-passers: the true K demand of the
            # flagship tile itself (capped at the K candidates the binner
            # selected; `truncated` flags saturation).
            n_tile_true = jnp.sum(jnp.any(ok, axis=0), axis=-1)      # ()
            return n_alpha, n_live, n_row_true, n_tile_true

        b = 8
        nb = -(-t_total // b)
        pad_t = nb * b - t_total

        def pad(x):
            return jnp.concatenate([x, x[:1].repeat(pad_t, 0)], 0) \
                if pad_t else x

        xs = (pad(dirs_t).reshape(nb, b, th * tw, 3),
              pad(idx_c).reshape(nb, b, k),
              pad(a.valid).reshape(nb, b, k))

        def body(carry, batch):
            h_alpha, h_live, h_row, h_tile = carry
            na, nl, nr, nt = jax.vmap(tile_fn)(batch)
            h_alpha = h_alpha.at[na.reshape(-1)].add(1)
            h_live = h_live.at[nl.reshape(-1)].add(1)
            h_row = h_row.at[nr.reshape(-1)].add(1)
            h_tile = h_tile.at[nt.reshape(-1)].add(1)
            return (h_alpha, h_live, h_row, h_tile), None

        init = (jnp.zeros(k + 1, jnp.int32), jnp.zeros(k + 1, jnp.int32),
                jnp.zeros(k + 1, jnp.int32), jnp.zeros(k + 1, jnp.int32))
        (h_alpha, h_live, h_row, h_tile), _ = jax.lax.scan(body, init, xs)
        return h_alpha, h_live, h_row, h_tile

    @functools.partial(jax.jit, static_argnums=1)
    def tile_binned_counts(bundle, snap: bool):
        """Exact per-(8x128)-tile BINNED candidate counts (no K cap) under
        the box footprint, with/without the integer-sample snap cull — the
        chunk-skip / truncation profile the kernel actually sees."""
        from lidar_rt_tpu.ops.binning import footprint_bounds
        from dataclasses import replace
        cfg = replace(TILE, sample_snap=snap)
        row_lo, row_hi, col_c, col_half, rng, live = footprint_bounds(
            grid, W, w2s, bundle.means, bundle.scales, bundle.opacities,
            cfg, rotations=bundle.rotations)
        ty = jnp.arange(tiles_y, dtype=jnp.float32)
        t_row_lo = ty * th
        t_row_hi = jnp.minimum((ty + 1) * th, H)
        sec_c = jnp.arange(tiles_x, dtype=jnp.float32) * tw + tw / 2.0

        def over_n(chunk):
            rl, rh, cc, ch_, lv = chunk
            row_in = ((rl[None, :] <= t_row_hi[:, None] - 0.5)
                      & (rh[None, :] >= t_row_lo[:, None] - 0.5))  # (TY, C)
            d = jnp.abs((cc[None, :] - sec_c[:, None]
                         + W / 2.0) % W - W / 2.0)                 # (TX, C)
            col_in = d <= (ch_[None, :] + tw / 2.0 + 0.5)
            ov = (row_in[:, None, :] & col_in[None, :, :]
                  & lv[None, None, :])
            return jnp.sum(ov, axis=-1).astype(jnp.int32)          # (TY, TX)

        c = 8192
        nchunks = n // c
        parts = (row_lo.reshape(nchunks, c), row_hi.reshape(nchunks, c),
                 col_c.reshape(nchunks, c), col_half.reshape(nchunks, c),
                 live.reshape(nchunks, c))

        def body(acc, chunk):
            return acc + over_n(chunk), None

        z = jnp.zeros((tiles_y, tiles_x), jnp.int32)
        counts, _ = jax.lax.scan(body, z, parts)
        return counts.reshape(-1)

    @jax.jit
    def footprint_row_counts(bundle):
        """Per (pixel-row, 128-col sector) candidate counts under the
        binner's conservative BOX footprint and under an ellipse-slice
        refinement (azimuth half-width shrunk by the row's normalized
        elevation offset) — what a row-refined binner could select."""
        from lidar_rt_tpu.ops.binning import footprint_bounds
        row_lo, row_hi, col_c, col_half, rng, live = footprint_bounds(
            grid, W, w2s, bundle.means, bundle.scales, bundle.opacities,
            TILE, rotations=bundle.rotations)
        rows = jnp.arange(H, dtype=jnp.float32)[:, None]      # (H, 1)
        sec_c = jnp.arange(tiles_x, dtype=jnp.float32) * tw + tw / 2.0

        def over_n(chunk):
            rl, rh, cc, ch_, lv = chunk
            row_in = (rows >= rl[None, :]) & (rows <= rh[None, :])  # (H, C)
            rc = 0.5 * (rl + rh)
            rhalf = jnp.maximum(0.5 * (rh - rl), 1e-6)
            frac = jnp.clip((rows - rc[None, :]) / rhalf[None, :], -1., 1.)
            ch_row = ch_[None, :] * jnp.sqrt(
                jnp.maximum(1.0 - frac * frac, 0.0))          # (H, C)
            # sector [x0, x0+tw) overlap, wrapped azimuth
            d = jnp.abs((cc[None, :] - sec_c[:, None]
                         + W / 2.0) % W - W / 2.0)            # (TX, C)
            col_in_box = d <= (ch_[None, :] + tw / 2.0)       # (TX, C)
            col_in_ell = (d[:, None, :]
                          <= ch_row[None, :, :] + tw / 2.0)   # (TX, H, C)
            lv_ = lv[None, None, :]
            box = jnp.sum(row_in[None] & col_in_box[:, None, :] & lv_,
                          axis=-1)
            ell = jnp.sum(row_in[None] & col_in_ell & lv_, axis=-1)
            return box.astype(jnp.int32), ell.astype(jnp.int32)  # (TX, H)

        c = 8192
        nchunks = n // c
        parts = (row_lo.reshape(nchunks, c), row_hi.reshape(nchunks, c),
                 col_c.reshape(nchunks, c), col_half.reshape(nchunks, c),
                 live.reshape(nchunks, c))

        def body(acc, chunk):
            b, e = over_n(chunk)
            return (acc[0] + b, acc[1] + e), None

        z = jnp.zeros((tiles_x, H), jnp.int32)
        (box, ell), _ = jax.lax.scan(body, (z, z), parts)
        return box, ell

    t0 = time.time()
    h_alpha, h_live, h_row, h_tile = jax.block_until_ready(stats(bundle))
    h_alpha = np.asarray(h_alpha, np.float64)
    h_live = np.asarray(h_live, np.float64)
    h_row = np.asarray(h_row, np.float64)
    h_tile = np.asarray(h_tile, np.float64)
    box, ell = jax.block_until_ready(footprint_row_counts(bundle))
    box, ell = np.asarray(box).ravel(), np.asarray(ell).ravel()
    tc_raw = np.asarray(jax.block_until_ready(
        tile_binned_counts(bundle, False)))
    tc_snap = np.asarray(jax.block_until_ready(
        tile_binned_counts(bundle, True)))
    print(f"computed in {time.time() - t0:.1f} s "
          f"({int(h_alpha.sum())} rays incl. tile padding)")

    def describe(name, h):
        tot = h.sum()
        xs = np.arange(len(h))
        mean = (h * xs).sum() / tot
        cum = np.cumsum(h) / tot
        pct = {p: int(np.searchsorted(cum, p / 100.0)) for p in
               (50, 90, 99, 99.9)}
        mx = int(xs[h > 0].max()) if (h > 0).any() else 0
        over = {b: float(h[xs > b].sum() / tot) for b in (32, 64, 128)}
        print(f"{name}: mean {mean:.1f}  p50 {pct[50]}  p90 {pct[90]}  "
              f"p99 {pct[99]}  p99.9 {pct[99.9]}  max {mx}")
        print(f"  fraction of rays over 32/64/128: "
              f"{over[32]:.4f} / {over[64]:.4f} / {over[128]:.4f}")

    describe("n_alpha (gate-passing pairs/ray)   ", h_alpha)
    describe("n_live  (depth-ordered live pairs) ", h_live)
    describe("n_row_true (unique gate-passing per 1x128 row, of tile's K)",
             h_row)

    def describe_arr(name, v):
        print(f"{name}: mean {v.mean():.1f}  p50 {np.percentile(v, 50):.0f}"
              f"  p90 {np.percentile(v, 90):.0f}"
              f"  p99 {np.percentile(v, 99):.0f}  max {v.max()}  "
              f"frac>128 {np.mean(v > 128):.4f}  "
              f"frac>192 {np.mean(v > 192):.4f}")

    describe_arr("row-sector BOX footprint count    ", box)
    describe_arr("row-sector ELLIPSE-slice count    ", ell)

    describe("n_tile_true (unique gate-passing per 8x128 TILE, of its K)",
             h_tile)

    def describe_tiles(name, v):
        print(f"{name}: mean {v.mean():.1f}  p50 {np.percentile(v, 50):.0f}"
              f"  p90 {np.percentile(v, 90):.0f}"
              f"  p99 {np.percentile(v, 99):.0f}  max {v.max()}  "
              f"frac<=128 {np.mean(v <= 128):.4f}  "
              f"frac<=256 {np.mean(v <= 256):.4f}")

    describe_tiles("8x128-tile binned count, snap OFF", tc_raw)
    describe_tiles("8x128-tile binned count, snap ON ", tc_snap)
    print(f"snap cull: binned pairs {tc_raw.sum()} -> {tc_snap.sum()} "
          f"({tc_snap.sum() / max(tc_raw.sum(), 1):.3f}x)")


if __name__ == "__main__":
    main()
