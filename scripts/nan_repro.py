"""Repro: 8x256 K=128 tile config NaNs immediately at Waymo scale."""

from __future__ import annotations

import sys

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

TH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
TW = int(sys.argv[2]) if len(sys.argv) > 2 else 256
K = int(sys.argv[3]) if len(sys.argv) > 3 else 128

frames, track = synthetic.generate(num_frames=4, height=64, width=2650)
ITERS = int(sys.argv[4]) if len(sys.argv) > 4 else 200
d = default_experiment().to_dict()
d["opt"].update(iterations=ITERS, densify_until_iter=ITERS * 5 // 12,
                opacity_reset_interval=ITERS // 5,
                position_lr_max_steps=ITERS)
args = Args(d)
scene = build.assemble_scene(frames, [track], args, capacity_headroom=2.0)
tile = TileConfig(tile_h=TH, tile_w=TW, max_per_tile=K, binner="hier",
                  approx_topk=True)
cfg = tracer_lib.TraceConfig(tile=tile, exact_order=False, ray_block=512)
trainer = loop.Trainer(scene, frames, args, cfg)
trainer.snapshot_dir = "/tmp/nan_snap"
import os
os.makedirs("/tmp/nan_snap", exist_ok=True)

# Single forward first
out = trainer.render_eval(0)
for k in ("depth", "intensity", "raydrop"):
    a = np.asarray(out[k])
    print(f"fwd {k}: finite={np.isfinite(a).all()} "
          f"min={np.nanmin(a):.3f} max={np.nanmax(a):.3f}", flush=True)

try:
    hist = trainer.run(iterations=ITERS, log_every=1)
except FloatingPointError as e:
    print("GUARD:", e, flush=True)
    hist = trainer.history
for h in hist[-10:]:
    print(h["iteration"], h["loss"], flush=True)
