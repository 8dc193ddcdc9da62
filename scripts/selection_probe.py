"""Selection-precision probe: render fidelity of a K=128 budget under
different candidate-selection rules (VERDICT r4 task 3 design input).

Per 16x32 tile, composite the tile's rays against:

  truth : all binned candidates (K=1024, nearest-first tile order)
  A     : nearest-128 of the binned list      (current binner behavior)
  B     : nearest-128 of int-sample survivors (integer-overlap test)
  C     : nearest-128 of true gate-passers    (oracle footprint — upper
          bound of any footprint-based selection at this K)

and report per-ray depth error and captured weight vs truth.  If C
matches truth but A does not, selection precision is the 16x32 K=128
quality gap and B shows how much an integer-sample overlap test closes.
If even C misses, the demand is real and only a bigger budget (tail
passes / larger K) closes it.

Run (chip): PYTHONPATH=/root/repo:/root/.axon_site python scripts/selection_probe.py
CPU-scale:  SP_CPU=1 python scripts/selection_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("SP_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from lidar_rt_tpu.core import quaternions as quat_lib  # noqa: E402
from lidar_rt_tpu.core import rays as rays_lib  # noqa: E402
from lidar_rt_tpu.core import transforms  # noqa: E402
from lidar_rt_tpu.ops import geometry  # noqa: E402
from lidar_rt_tpu.ops.binning import (TileConfig, bin_surfels,  # noqa: E402
                                      footprint_bounds)

H, W = bench.H, bench.W
N = int(os.environ.get("SP_N", bench.N_SURFELS))
TH, TW = 16, 32
K_FULL = 1024
K_SEL = 128


def main() -> None:
    grid = rays_lib.SensorGrid.from_bounds(H, (-0.31, 0.04),
                                           pixel_offset=0.5)
    s2w = jnp.eye(4).at[2, 3].set(2.0)
    bundle = bench.street_scene_bundle(N)
    w2s = transforms.invert_se3(s2w)
    tile = TileConfig(tile_h=TH, tile_w=TW, max_per_tile=K_FULL,
                      binner="hier", coarse_factor=4, sample_snap=False)
    tiles_y, tiles_x = tile.num_tiles(H, W)
    t_total = tiles_y * tiles_x
    n = bundle.means.shape[0]

    @jax.jit
    def run(bundle):
        asn = bin_surfels(grid, W, w2s, bundle.means, bundle.scales,
                          bundle.opacities, tile,
                          rotations=bundle.rotations)
        row_lo, row_hi, col_c, col_half, _rng, _live = footprint_bounds(
            grid, W, w2s, bundle.means, bundle.scales, bundle.opacities,
            tile, rotations=bundle.rotations)
        idx_c = jnp.clip(asn.index, 0, n - 1)                 # (T, K)

        ty = (jnp.arange(t_total) // tiles_x)
        tx = (jnp.arange(t_total) % tiles_x)
        t_row_lo = (ty * TH).astype(jnp.float32)[:, None]
        t_row_hi = jnp.minimum((ty + 1) * TH, H).astype(
            jnp.float32)[:, None]
        rl = row_lo[idx_c]
        rh = row_hi[idx_c]
        int_row = (jnp.floor(jnp.minimum(rh, t_row_hi - 1.0))
                   >= jnp.ceil(jnp.maximum(rl, t_row_lo)))
        first_col = (tx * TW).astype(jnp.float32)[:, None]
        o = jnp.mod(col_c[idx_c] - first_col, float(W))
        o = jnp.where(o > W / 2.0, o - W, o)
        ch = col_half[idx_c]
        int_col = (jnp.floor(jnp.minimum(o + ch, TW - 1.0))
                   >= jnp.ceil(jnp.maximum(o - ch, 0.0)))
        int_ok = int_row & int_col & asn.valid                # (T, K)

        origin, dirs = rays_lib.range_rays(grid, W, s2w)
        row_idx = jnp.clip(jnp.arange(tiles_y * TH), 0, H - 1)
        col_idx = jnp.mod(jnp.arange(tiles_x * TW), W)
        dirs_t = (dirs[row_idx][:, col_idx]
                  .reshape(tiles_y, TH, tiles_x, TW, 3)
                  .transpose(0, 2, 1, 3, 4)
                  .reshape(t_total, TH * TW, 3))
        rot = quat_lib.to_rotation_matrix(bundle.rotations)
        frames = geometry.build_frames(bundle.means, rot, origin)

        def composite(alpha, t, sel):
            """Tile-order compositing restricted to sel; (rays,) depth,
            sum-weight, hit mass."""
            a = jnp.where(sel[None, :], alpha, 0.0)
            one_m = 1.0 - a
            t_excl = jnp.cumprod(one_m, axis=1) / one_m
            live = (t_excl * one_m >= geometry.T_MIN)
            w = a * t_excl * live
            return (jnp.sum(w * t, axis=1), jnp.sum(w, axis=1))

        def tile_fn(args):
            dirs_tile, idx, valid, iok = args
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
            alpha = jnp.where(ok, alpha_raw, 0.0)              # (R, K)
            gate = ok.any(axis=0)                              # (K,)

            sel_truth = valid
            rank_a = jnp.cumsum(valid)
            sel_a = valid & (rank_a <= K_SEL)
            rank_b = jnp.cumsum(iok)
            sel_b = iok & (rank_b <= K_SEL)
            rank_c = jnp.cumsum(gate)
            sel_c = gate & (rank_c <= K_SEL)

            d_t, w_t = composite(alpha, t, sel_truth)
            outs = []
            for sel in (sel_a, sel_b, sel_c):
                d, wsum = composite(alpha, t, sel)
                # depth error only where truth has meaningful hit mass
                m = w_t > 0.5
                derr = jnp.abs(d / jnp.maximum(w_t, 1e-6)
                               - d_t / jnp.maximum(w_t, 1e-6))
                outs.append((jnp.where(m, derr, 0.0), m,
                             jnp.sum(wsum) / jnp.maximum(jnp.sum(w_t),
                                                         1e-6)))
            return outs

        b = 4
        nb = -(-t_total // b)
        pad_t = nb * b - t_total

        def pad(x):
            return jnp.concatenate([x, x[:1].repeat(pad_t, 0)], 0) \
                if pad_t else x

        xs = (pad(dirs_t).reshape(nb, b, TH * TW, 3),
              pad(idx_c).reshape(nb, b, K_FULL),
              pad(asn.valid).reshape(nb, b, K_FULL),
              pad(int_ok).reshape(nb, b, K_FULL))

        def body(_, batch):
            return None, jax.vmap(tile_fn)(batch)

        _, res = jax.lax.scan(body, None, xs)
        return res, jnp.sum(asn.truncated)

    t0 = time.time()
    (res, trunc) = jax.block_until_ready(run(bundle))
    print(f"tile {TH}x{TW} truth-K={K_FULL} sel-K={K_SEL} N={N} "
          f"({time.time() - t0:.0f}s, truth truncated {int(trunc)})")
    for name, (derr, m, wcap) in zip(("A nearest-binned", "B int-sample",
                                      "C gate-oracle"), res):
        derr = np.asarray(derr).reshape(-1)
        m = np.asarray(m).reshape(-1)
        e = derr[m]
        wc = np.asarray(wcap).reshape(-1)
        print(f"{name:18s} depth err vs truth: mean {e.mean():.4f}  "
              f"p90 {np.percentile(e, 90):.4f}  p99 "
              f"{np.percentile(e, 99):.4f}  max {e.max():.3f}  "
              f"| weight capture mean {wc.mean():.4f} min {wc.min():.4f}")


if __name__ == "__main__":
    main()
