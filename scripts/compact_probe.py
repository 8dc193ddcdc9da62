"""Measure the primitives a per-ray compacted-operand design stands on
(VERDICT r4 task 2: turn the roofline's *estimated* gather cost into data).

A compacted design needs, per training step (operands change every step;
only the index lists amortize over rebin_interval):

  1. row-GATHER of per-candidate operands:  (N, F)[idx (R*K',)] -> (R*K', F)
  2. the compacted kernel's fwd+bwd pair math (~8x fewer pairs than dense)
  3. row-SCATTER-ADD of per-pair gradients: (R*K', F16) +-> (N, F16)

and once per rebin (amortized /10):

  4. per-ray top-K'-by-depth gate-passing list construction from the tile
     assignment.

This script times 1-4 standalone at bench shapes (64x2650 rays, 131k
surfels, K' in {16, 32, 64}; F = 58 full pack / 16 geometric-only) and
prints the per-step total a compacted design would pay BEFORE any kernel
work, next to the dense flagship's measured 11.3 ms step.  If (1)+(3)
alone exceed the dense step, the roofline's dismissal is measured, not
estimated.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/compact_probe.py
"""

from __future__ import annotations

import functools
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from lidar_rt_tpu.core import quaternions as quat_lib  # noqa: E402
from lidar_rt_tpu.core import rays as rays_lib  # noqa: E402
from lidar_rt_tpu.core import transforms  # noqa: E402
from lidar_rt_tpu.ops import geometry  # noqa: E402
from lidar_rt_tpu.ops.binning import TileConfig, bin_surfels  # noqa: E402

H, W = bench.H, bench.W
N = bench.N_SURFELS
RAYS = H * W


def timeit(fn, *args, iters=20, warmup=3):
    """Naive per-call timing — OK for host-visible work, but the axon
    tunnel under-waits un-fetched outputs (PERF_NOTES round-2
    methodology warning); use timeit_chained for device-only ops."""
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    del out
    return (time.time() - t0) / iters * 1e3


def chained_gather_ms(ops, idx, iters=8):
    """Time `ops[idx]` with a sequential array-to-array dependency chain
    inside one jit (each iteration's input depends on the previous
    output row), so the tunnel cannot elide or under-wait any step."""

    @jax.jit
    def many(ops, idx, carry):
        def body(c, _):
            o = ops.at[0].add(c * 0.0)   # dependency injection, ~2% cost
            out = o[idx]
            return out[0], ()

        final, _ = jax.lax.scan(body, carry, None, length=iters)
        return final

    carry = jnp.zeros((ops.shape[1],), ops.dtype)
    jax.block_until_ready(many(ops, idx, carry))   # compile
    t0 = time.time()
    np.asarray(many(ops, idx, carry))              # fetch = full wait
    return (time.time() - t0) / iters * 1e3


def chained_scatter_ms(idx, grads, n, iters=8):
    @jax.jit
    def many(idx, grads, carry):
        def body(c, _):
            g = grads.at[0].add(c * 0.0)
            out = jnp.zeros((n, grads.shape[1]), grads.dtype).at[idx].add(g)
            return out[0], ()

        final, _ = jax.lax.scan(body, carry, None, length=iters)
        return final

    carry = jnp.zeros((grads.shape[1],), grads.dtype)
    jax.block_until_ready(many(idx, grads, carry))
    t0 = time.time()
    np.asarray(many(idx, grads, carry))
    return (time.time() - t0) / iters * 1e3


def main() -> None:
    rng = np.random.default_rng(0)
    bundle = bench.street_scene_bundle(N)

    print(f"rays {RAYS}, surfels {N}")
    results = {}
    for f_width in (58,):
        ops = jnp.asarray(rng.normal(size=(N, f_width)), jnp.float32)
        for kp in (16, 32, 64):
            idx = jnp.asarray(rng.integers(0, N, size=(RAYS * kp,)),
                              jnp.int32)
            ms = chained_gather_ms(ops, idx)
            gb = RAYS * kp * f_width * 4 / 1e9
            results[f"gather F{f_width} K'{kp}"] = ms
            print(f"gather  F={f_width:2d} K'={kp:2d}: {ms:7.2f} ms "
                  f"({gb:.2f} GB out, {gb / ms * 1e3:.0f} GB/s)")

    for kp in (16, 32, 64):
        idx = jnp.asarray(rng.integers(0, N, size=(RAYS * kp,)), jnp.int32)
        grads = jnp.asarray(rng.normal(size=(RAYS * kp, 16)), jnp.float32)
        ms = chained_scatter_ms(idx, grads, N)
        results[f"scatter F16 K'{kp}"] = ms
        print(f"scatter F=16 K'={kp:2d}: {ms:7.2f} ms")

    # 3b. the scatter-free alternative: pairs pre-SORTED by candidate at
    # bin time (the permutation amortizes), backward does a contiguous
    # segment-sum.  Measures the best-case per-candidate accumulation.
    for kp in (32,):
        seg = jnp.sort(jnp.asarray(
            rng.integers(0, N, size=(RAYS * kp,)), jnp.int32))
        grads = jnp.asarray(rng.normal(size=(RAYS * kp, 16)), jnp.float32)

        @jax.jit
        def segsum(seg, g, carry):
            def body(c, _):
                gi = g.at[0].add(c * 0.0)
                out = jax.ops.segment_sum(gi, seg, num_segments=N)
                return out[0], ()

            final, _ = jax.lax.scan(body, carry, None, length=10)
            return final

        carry = jnp.zeros((16,), jnp.float32)
        jax.block_until_ready(segsum(seg, grads, carry))
        t0 = time.time()
        np.asarray(segsum(seg, grads, carry))
        ms = (time.time() - t0) / 10 * 1e3
        results[f"segsum F16 K'{kp}"] = ms
        print(f"sorted segment-sum F=16 K'={kp}: {ms:7.2f} ms")

    # 4. per-ray list construction from the flagship tile assignment
    # (amortized over rebin_interval): per tile, alpha-gate all
    # (ray, candidate) pairs, then per-ray nearest-K' among gate-passers.
    grid = rays_lib.SensorGrid.from_bounds(H, (-0.31, 0.04),
                                           pixel_offset=0.5)
    s2w = jnp.eye(4).at[2, 3].set(2.0)
    w2s = transforms.invert_se3(s2w)
    tile = TileConfig(tile_h=8, tile_w=128, max_per_tile=256,
                      binner="hier", approx_topk=True)
    tiles_y, tiles_x = tile.num_tiles(H, W)
    t_total = tiles_y * tiles_x
    th, tw, k = tile.tile_h, tile.tile_w, tile.max_per_tile

    @functools.partial(jax.jit, static_argnums=(1,))
    def build_lists(bundle, kp: int):
        asn = bin_surfels(grid, W, w2s, bundle.means, bundle.scales,
                          bundle.opacities, tile,
                          rotations=bundle.rotations)
        idx_c = jnp.clip(asn.index, 0, N - 1)
        origin, dirs = rays_lib.range_rays(grid, W, s2w)
        row_idx = jnp.clip(jnp.arange(tiles_y * th), 0, H - 1)
        col_idx = jnp.mod(jnp.arange(tiles_x * tw), W)
        dirs_t = (dirs[row_idx][:, col_idx]
                  .reshape(tiles_y, th, tiles_x, tw, 3)
                  .transpose(0, 2, 1, 3, 4)
                  .reshape(t_total, th * tw, 3))
        rot = quat_lib.to_rotation_matrix(bundle.rotations)
        frames = geometry.build_frames(bundle.means, rot, origin)

        def tile_fn(args):
            dirs_tile, idx, valid = args
            hp = jax.lax.Precision.HIGHEST
            axes = jnp.stack([frames.n[idx], frames.w1[idx],
                              frames.w2[idx]], axis=0)
            prods = jnp.einsum("rc,akc->ark", dirs_tile, axes,
                               precision=hp)
            qd, b_u, b_v = prods[0], prods[1], prods[2]
            safe_qd = jnp.where(jnp.abs(qd) > geometry.DENOM_EPS, qd,
                                geometry.DENOM_EPS)
            t = frames.p[idx][None, :] / safe_qd
            sk = bundle.scales[idx]
            u = (frames.a_u[idx][None, :] + t * b_u) / sk[None, :, 0]
            v = (frames.a_v[idx][None, :] + t * b_v) / sk[None, :, 1]
            g = jnp.exp(-0.5 * (u * u + v * v))
            ar = jnp.minimum(geometry.ALPHA_MAX,
                             bundle.opacities[idx][None, :] * g)
            ok = ((t >= geometry.DEPTH_MIN)
                  & (jnp.abs(qd) > geometry.DENOM_EPS)
                  & (ar >= geometry.ALPHA_MIN) & valid[None, :])
            score = jnp.where(ok, -t, -jnp.inf)
            _, sel = jax.lax.top_k(score, kp)          # (R, K') nearest
            return jnp.take_along_axis(
                jnp.broadcast_to(idx[None], score.shape), sel, axis=1)

        b = 8
        nb = -(-t_total // b)
        pad_t = nb * b - t_total

        def pad(x):
            return jnp.concatenate([x, x[:1].repeat(pad_t, 0)], 0) \
                if pad_t else x

        xs = (pad(dirs_t).reshape(nb, b, th * tw, 3),
              pad(idx_c).reshape(nb, b, k),
              pad(asn.valid).reshape(nb, b, k))
        _, lists = jax.lax.scan(
            lambda _, bb: (None, jax.vmap(tile_fn)(bb)), None, xs)
        return lists

    for kp in (32,):
        ms = timeit(lambda b: build_lists(b, kp), bundle, iters=5)
        results[f"build_lists K'{kp}"] = ms
        print(f"per-ray list build K'={kp}: {ms:.2f} ms "
              f"(amortized /10: {ms / 10:.2f} ms/step)")

    # Headline: the floor a compacted design pays before ANY kernel work.
    for kp in (16, 32, 64):
        floor = (results[f"gather F58 K'{kp}"]
                 + results[f"scatter F16 K'{kp}"]
                 + results.get("build_lists K'32", 0.0) / 10)
        mray = RAYS / (floor * 1e-3) / 1e6
        print(f"K'={kp:2d}: gather+scatter+amortized-build floor "
              f"{floor:6.2f} ms  (= {mray:5.1f} Mray/s ceiling BEFORE "
              f"kernel work; dense flagship step: ~11.3 ms)")


if __name__ == "__main__":
    main()
