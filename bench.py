"""Benchmark: fwd+bwd ray throughput of the tiled tracer on a Waymo-scale
scan (64 x 2650, ~130k surfels).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the driver north-star of 1 Gray/s fwd+bwd
per chip (BASELINE.md), i.e. value_mray / 1000.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lidar_rt_tpu.core import rays as rays_lib
from lidar_rt_tpu.ops import tracer as tracer_lib
from lidar_rt_tpu.ops.binning import TileConfig
from lidar_rt_tpu.ops.composite import SurfelBundle

H, W = 64, 2650
N_SURFELS = 131_072
WARMUP, ITERS = 2, 20
# Sweep overrides (perf triage only; the committed defaults below are the
# flagship): BENCH_TILE_H, BENCH_K, BENCH_TAIL, BENCH_RAY_BLOCK.
import os as _os
_TILE_H = int(_os.environ.get("BENCH_TILE_H", 8))
_TILE_W = int(_os.environ.get("BENCH_TILE_W", 128))
_K = int(_os.environ.get("BENCH_K", 256))
_TAIL = int(_os.environ.get("BENCH_TAIL", 0))
_RAY_BLOCK = int(_os.environ.get("BENCH_RAY_BLOCK", 512))
_EXACT = bool(int(_os.environ.get("BENCH_EXACT", 0)))
_MACRO = int(_os.environ.get("BENCH_MACRO_COLS", 0))
_INT_EPS = float(_os.environ.get("BENCH_INT_EPS", 0.25))
# Rebin-interval amortization (train/loop.py BinCache): the tile assignment
# is a stop-gradient visibility oracle re-binned every REBIN_EVERY renders
# of a frame, not every step (quality-validated at training scale by
# scripts/quality_check.py with the same interval and footprint pad).
REBIN_EVERY = 10
REBIN_PAD_PX = 2.0


def street_scene_bundle(n: int, seed: int = 0) -> SurfelBundle:
    """A street-like surfel soup: ground annulus + wall bands, so tiles see
    realistic (non-uniform) candidate counts."""
    rng = np.random.default_rng(seed)
    n_ground = n // 2
    n_wall = n - n_ground
    # ground: annulus 3..60 m
    r = np.sqrt(rng.uniform(3.0 ** 2, 60.0 ** 2, n_ground))
    th = rng.uniform(-np.pi, np.pi, n_ground)
    ground = np.stack([r * np.cos(th), r * np.sin(th),
                       rng.normal(0, 0.05, n_ground)], 1)
    # walls: two sides of a corridor + scattered facades
    x = rng.uniform(-60, 60, n_wall)
    side = rng.choice([-1, 1], n_wall)
    y = side * rng.uniform(6, 25, n_wall)
    z = rng.uniform(0, 6, n_wall)
    walls = np.stack([x, y, z], 1)
    pts = np.concatenate([ground, walls]).astype(np.float32)

    quats = np.zeros((n, 4), np.float32)
    # ground facing up (identity: normal=+z), walls facing sideways
    quats[:n_ground, 0] = 1.0
    quats[n_ground:, 0] = np.sqrt(0.5)
    quats[n_ground:, 1] = np.sqrt(0.5)
    quats += rng.normal(0, 0.1, (n, 4)).astype(np.float32)

    sh = np.zeros((n, 16, 3), np.float32)
    sh[:, 0, :] = rng.uniform(-0.5, 1.0, (n, 3))
    return SurfelBundle(
        means=jnp.asarray(pts),
        rotations=jnp.asarray(quats),
        scales=jnp.asarray(rng.uniform(0.1, 0.35, (n, 2)).astype(np.float32)),
        opacities=jnp.asarray(rng.uniform(0.3, 0.95, n).astype(np.float32)),
        sh=jnp.asarray(sh))


def main() -> None:
    grid = rays_lib.SensorGrid.from_bounds(H, (-0.31, 0.04),
                                           pixel_offset=0.5)
    s2w = jnp.eye(4).at[2, 3].set(2.0)
    bg = jnp.array([0.0, 0.0, 1.0])
    bundle = street_scene_bundle(N_SURFELS)
    # Flagship config, re-validated by the round-3 two-seed quality ladder
    # (LADDER_r03.json / PERF_NOTES round 3): 8-row tiles K=256, hier
    # binner with TPU-native approximate top-k.  The K=128 contenders were
    # adjudicated against it at Waymo training scale: plain K=128 loses
    # real depth (truncates geometry), and K=128 + one cached tail pass
    # (reference re-launch semantics, forward.cu:282-291) ties on quality
    # and wins ~10% steady-state TRAINING it/s but loses on this dense
    # unpruned soup (tail runs near-full: 13.2 vs 18.0 Mray/s) — it stays
    # a config option (BENCH_TAIL=1 models the trainer's cached chain).
    # fast_math: channel/gradient MXU contractions at 1-pass bf16 — the
    # reference composites at full CUDA fp32 speed (forward.cu:240-272);
    # gated by scripts/tpu_parity.py --fast (round 3: PASS, chan err
    # 3.1e-3, grad cosines >= 0.9996) and the escalating hang probe
    # (scripts/fast_math_probe.sh: PASS all sizes post MXU-hoist).
    cfg = tracer_lib.TraceConfig(
        tile=TileConfig(tile_h=_TILE_H, tile_w=_TILE_W, max_per_tile=_K,
                        binner="hier", approx_topk=True, macro_cols=_MACRO,
                        pad_px=REBIN_PAD_PX, snap_pad_px=0.5,
                        int_eps=_INT_EPS),
        exact_order=_EXACT, ray_block=_RAY_BLOCK, fast_math=True,
        tail_passes=_TAIL)
    n_passes = cfg.tail_passes + 1

    from lidar_rt_tpu.core import transforms
    from lidar_rt_tpu.ops.binning import TileAssignment
    w2s = transforms.invert_se3(s2w)

    def step(carry, i):
        # The carry feeds back into the surfel opacities so lax.scan cannot
        # elide or overlap iterations: each step is a full fresh fwd+bwd.
        c, idx, val, trunc = carry
        # 1e-30-scale coupling: numerically invisible, but the dynamic
        # carry makes each iteration's input distinct so nothing hoists.
        # The carry is the (N,) gradient VECTOR, not a reduced scalar: a
        # scalar round-trip (full-array reduce -> rebroadcast next iter)
        # serializes the device pipeline and adds ~0.5 ms/iter of pure
        # measurement artifact (measured; see PERF_NOTES.md).
        b = bundle._replace(opacities=bundle.opacities + c * 1e-30)

        def rebin():
            chain = tracer_lib.bin_tail_chain(b, grid, W, w2s, cfg.tile,
                                              cfg.tail_passes)
            return (jnp.stack([a.index.astype(jnp.int32) for a in chain]),
                    jnp.stack([a.valid for a in chain]),
                    jnp.stack([a.truncated for a in chain]))

        idx, val, trunc = jax.lax.cond(i % REBIN_EVERY == 0, rebin,
                                       lambda: (idx, val, trunc))
        assignments = [TileAssignment(index=idx[p], valid=val[p],
                                      truncated=trunc[p])
                       for p in range(n_passes)]
        if n_passes == 1:
            assignments = assignments[0]

        def loss(b):
            out = tracer_lib.trace(b, grid, W, s2w, bg, 3, cfg,
                                   assignment=assignments)
            return (jnp.sum(jnp.abs(out.channels[..., 3])) * 1e-3
                    + jnp.sum(out.channels[..., 0] ** 2))

        l, g = jax.value_and_grad(loss)(b)
        return (g.opacities, idx, val, trunc), None

    tiles_y, tiles_x = cfg.tile.num_tiles(H, W)
    t_total = tiles_y * tiles_x

    @jax.jit
    def fwd_bwd_n(bundle):
        # ITERS steps inside one jit: measures device throughput without
        # per-dispatch host/tunnel latency (the device runs steps
        # back-to-back; verified against the profiler timeline).
        k = cfg.tile.max_per_tile
        carry0 = (jnp.zeros_like(bundle.opacities),
                  jnp.zeros((n_passes, t_total, k), jnp.int32),
                  jnp.zeros((n_passes, t_total, k), bool),
                  jnp.zeros((n_passes, t_total), jnp.int32))
        (out, _, _, _), _ = jax.lax.scan(step, carry0, jnp.arange(ITERS))
        return jnp.sum(out)

    for _ in range(WARMUP):
        l = fwd_bwd_n(bundle)
    jax.block_until_ready(l)

    t0 = time.perf_counter()
    l = fwd_bwd_n(bundle)
    jax.block_until_ready(l)
    dt = (time.perf_counter() - t0) / ITERS

    mrays = H * W / dt / 1e6
    print(json.dumps({
        "metric": "fwd+bwd ray throughput, 64x2650 scan, 131k surfels",
        "value": round(mrays, 2),
        "unit": "Mray/s/chip",
        "vs_baseline": round(mrays / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()
