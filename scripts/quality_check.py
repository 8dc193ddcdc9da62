"""Convergence quality check for tracer configs on the real chip.

Trains the synthetic dynamic scene on a compressed schedule (as in
PERF_NOTES round-1 evidence) with each tracer config and reports masked
depth/intensity/hit metrics on a held-out frame, plus train it/s.
Usage: python scripts/quality_check.py [iters] [HxW]
(HxW default 32x512; use 64x2650 for Waymo-scale flagship evidence —
tile-K truncation depends on surfel density per tile, so small-scene
results do not transfer to full scans.)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lidar_rt_tpu.config import Args, default_experiment
from lidar_rt_tpu.data import build, synthetic
from lidar_rt_tpu.ops import tracer as tracer_lib
from lidar_rt_tpu.ops.binning import TileConfig
from lidar_rt_tpu.train import loop

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
H, W = (int(x) for x in (sys.argv[2] if len(sys.argv) > 2
                         else "32x512").split("x"))
# Optional: scene seed (argv[3], default 0 — the round-3 ladder seed) and
# a config-name substring filter (argv[4]) for seed-stability re-runs of a
# contender subset.
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 0
ONLY = sys.argv[4] if len(sys.argv) > 4 else ""

# (name, steady tile, warmup tile | None, opt overrides, ray_block)
_T8K256 = TileConfig(tile_h=8, tile_w=128, max_per_tile=256, binner="hier",
                     approx_topk=True, pad_px=2.0)
_T4K128 = TileConfig(tile_h=4, tile_w=128, max_per_tile=128, binner="hier",
                     approx_topk=True, pad_px=2.0)
_T2K128 = TileConfig(tile_h=2, tile_w=128, max_per_tile=128, binner="hier",
                     approx_topk=True, pad_px=2.0)
_T16X32 = TileConfig(tile_h=16, tile_w=32, max_per_tile=128, binner="hier",
                     approx_topk=True, pad_px=2.0)
CONFIGS = [
    # (name, steady tile, warmup tile, opt overrides, ray_block, tail)
    ("8x128 K=256 rebin1 (r2 flagship)", _T8K256, None, {}, 512, 0),
    ("8x128 K=256 rebin10", _T8K256, None, {"rebin_interval": 10}, 512, 0),
    ("4x128 K=128 rebin10", _T4K128, None, {"rebin_interval": 10}, 512, 0),
    ("2x128 K=128 rebin10", _T2K128, None, {"rebin_interval": 10}, 256, 0),
    # Tail training: small-K fine tiles + one cached tail pass — the
    # candidate-budget reduction candidate (see PERF_NOTES).  K=128
    # truncation cost ~2x median depth without the tail; the tail pass
    # composites the truncated remainder from the cached chain.
    ("4x128 K=128 rebin10 tail1", _T4K128, None,
     {"rebin_interval": 10}, 512, 1),
    ("8x128 K=128 rebin10 tail1",
     TileConfig(tile_h=8, tile_w=128, max_per_tile=128, binner="hier",
                approx_topk=True, pad_px=2.0), None,
     {"rebin_interval": 10}, 512, 1),
    # Azimuth-NARROW tiles (round-4 subtile-demand study; round-5
    # RE-ADJUDICATION in LADDER_r05.json): the "demand fits K=128" table
    # was conditioned on the flagship's 256-selection (overcount probe);
    # plain 16x32 K=128 truncates on every ladder seed, 16x32+tail1 won
    # both ladder seeds at this 4-frame scale but was REFUTED at
    # 50-frame/265k rehearsal scale.  Bench soup: 26.8 vs the flagship's
    # 21.4 Mray/s (round-5 numbers).
    ("16x32 K=128 rebin10", _T16X32, None, {"rebin_interval": 10}, 512, 0),
    ("16x32 K=128 rebin10 tail1", _T16X32, None,
     {"rebin_interval": 10}, 512, 1),
    ("16x32 K=256->128 warmup", _T16X32,
     TileConfig(tile_h=16, tile_w=32, max_per_tile=256, binner="hier",
                approx_topk=True, pad_px=2.0),
     {"rebin_interval": 10}, 512, 0),
]
# (K=192 was considered from the survivor-stats per-tile demand — unique
# gate-passers p50 212 / max 240 — but K must be a multiple of the 128-lane
# chunk, and Mosaic pads lane dims to 128 anyway, so 192 computes like 256.)


def masked_eval(out, frames, f):
    gt_d = np.asarray(frames.range1[f])
    gt_i = np.asarray(frames.intensity1[f])
    gt_m = gt_d > 0
    pred_d = np.asarray(out["depth"])
    pred_i = np.asarray(out["intensity"])
    pred_hit = np.asarray(out["raydrop"]) < 0.5
    m = gt_m & pred_hit
    return {
        "depth_med": float(np.median(np.abs(pred_d - gt_d)[m])),
        "depth_rmse": float(np.sqrt(np.mean((pred_d - gt_d)[m] ** 2))),
        "int_mae": float(np.mean(np.abs(pred_i - gt_i)[m])),
        "hit_acc": float((pred_hit == gt_m).mean()),
        "coverage": float(m.sum() / max(gt_m.sum(), 1)),
    }


def run(name, tile, warmup_tile=None, opt_overrides=None, ray_block=512,
        tail_passes=0):
    # Scene assembly consumes the global numpy RNG; seed it per run so
    # every config trains on the SAME initial scene (otherwise batch
    # position confounds the comparison).
    import random as _random
    _random.seed(SEED)
    np.random.seed(SEED)
    frames, track = synthetic.generate(num_frames=4, height=H, width=W)
    # SEED drives the surfel init realization through assemble_scene's
    # explicit key (its internal default is a FIXED jax.random.key(0) —
    # global numpy seeding does not reach it).  The scene geometry itself
    # is deterministic; seed variation = a different init realization.
    d = default_experiment().to_dict()
    d["opt"].update(densify_until_iter=ITERS * 5 // 12,
                    opacity_reset_interval=ITERS // 5,
                    iterations=ITERS, position_lr_max_steps=ITERS,
                    **(opt_overrides or {}))
    args = Args(d)
    scene = build.assemble_scene(frames, [track], args,
                                 key=jax.random.key(SEED),
                                 capacity_headroom=2.0)
    # fast_math matches the round-3 flagship default (gated by
    # PARITY_r03.json); this ladder doubles as its training-scale
    # quality validation.
    cfg = tracer_lib.TraceConfig(tile=tile, exact_order=False,
                                 ray_block=ray_block,
                                 tail_passes=tail_passes, fast_math=True)
    wcfg = None if warmup_tile is None else tracer_lib.TraceConfig(
        tile=warmup_tile, exact_order=False, ray_block=ray_block,
        fast_math=True)
    trainer = loop.Trainer(scene, frames, args, cfg, warmup_cfg=wcfg)
    f_eval = frames.eval_frames[0] if frames.eval_frames else 0

    t0 = time.perf_counter()
    hist = trainer.run(iterations=ITERS, log_every=max(ITERS // 8, 1))
    dt = time.perf_counter() - t0
    step = max(len(hist) // 8, 1)
    print("  losses:", ["%.4f" % h["loss"] for h in hist[::step]],
          flush=True)
    out = trainer.render_eval(f_eval)
    m = masked_eval(jax.tree.map(np.asarray, out), frames, f_eval)
    alive = int(trainer.state.scene.background.num_alive)
    print(f"{name:36s}: {ITERS / dt:6.1f} it/s  alive={alive}  "
          + "  ".join(f"{k}={v:.4f}" for k, v in m.items()), flush=True)


if __name__ == "__main__":
    for name, tile, warm, opt_over, rb, tail in CONFIGS:
        if ONLY and not any(s in name for s in ONLY.split(",")):
            continue
        run(name, tile, warm, opt_over, rb, tail_passes=tail)
