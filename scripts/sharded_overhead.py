"""Bound the sharded-step overhead on the real chip (VERDICT r3 #5).

The multi-chip path's correctness is proven on the virtual CPU mesh
(tests/test_parallel.py: dp2 grads == mean of per-frame grads,
ShardedTrainer == Trainer trajectories); what that cannot measure is the
*cost* of the shard_map plumbing — the dp-delta BinCache psum, the
band-major cache relayout, the replicated-scene broadcast transpose.  A
(dp=1, rays=1) mesh runs the full sharded machinery on the one real chip
with zero actual communication, so

    plain Trainer it/s  vs  ShardedTrainer it/s @ 1-device mesh

bounds the pure framework overhead; any multi-chip slowdown beyond it is
real collective traffic, which scales with ICI bandwidth, not with this
code.  Result table goes to PERF_NOTES.md.

Usage: python scripts/sharded_overhead.py [iters] [HxW]
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lidar_rt_tpu.config import Args, default_experiment
from lidar_rt_tpu.data import build, synthetic
from lidar_rt_tpu.ops import tracer as tracer_lib
from lidar_rt_tpu.parallel import make_mesh
from lidar_rt_tpu.parallel.trainer import ShardedTrainer
from lidar_rt_tpu.train import loop

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 300
H, W = (int(x) for x in (sys.argv[2] if len(sys.argv) > 2
                         else "64x2650").split("x"))


def build_inputs():
    # Deterministic scene + init (same recipe as scripts/quality_check.py).
    import random as _random
    _random.seed(0)
    np.random.seed(0)
    frames, track = synthetic.generate(num_frames=4, height=H, width=W)
    d = default_experiment().to_dict()
    # Densify/reset off: a clean steady-state step-cost comparison (the
    # schedule logic is shared python code, identical in both trainers).
    d["opt"].update(iterations=ITERS, position_lr_max_steps=ITERS,
                    densify_from_iter=10 ** 9, densify_until_iter=0,
                    opacity_reset_interval=10 ** 9, rebin_interval=10)
    args = Args(d)
    scene = build.assemble_scene(frames, [track], args,
                                 key=jax.random.key(0),
                                 capacity_headroom=2.0)
    return frames, args, scene


def timed_run(trainer) -> float:
    # One warm-up slice to compile, then the measured remainder.
    warm = min(30, ITERS // 4)
    trainer.run(iterations=warm, log_every=10 ** 9)
    t0 = time.perf_counter()
    trainer.run(iterations=ITERS - warm, log_every=10 ** 9)
    return (ITERS - warm) / (time.perf_counter() - t0)


def main() -> None:
    cfg = tracer_lib.TraceConfig()   # flagship defaults
    results = {}
    # rebin=10 is the production point; rebin=1 attributes the tax: if
    # the overhead RATIO shrinks when binning dominates the step, the
    # sharded cache merge machinery (delta-psum + relayout) is the tax;
    # if it grows, the per-step render plumbing is.
    for rebin in (10, 1):
        for kind in ("plain", "sharded"):
            frames, args, scene = build_inputs()
            d = args.to_dict()
            d["opt"].update(rebin_interval=rebin)
            args = Args(d)
            if kind == "plain":
                tr = loop.Trainer(scene, frames, args, cfg)
            else:
                tr = ShardedTrainer(scene, frames, args,
                                    mesh=make_mesh(dp=1, rays=1),
                                    trace_cfg=cfg)
            results[kind, rebin] = timed_run(tr)
            print(f"{kind:8s} rebin={rebin:2d}: "
                  f"{results[kind, rebin]:7.2f} it/s", flush=True)
    for rebin in (10, 1):
        p, s = results["plain", rebin], results["sharded", rebin]
        print(f"rebin={rebin:2d}: shard_map overhead {(p / s - 1) * 100:+6.1f} %")


if __name__ == "__main__":
    main()
