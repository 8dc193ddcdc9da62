"""Catch the first non-finite gradient and attribute it to a loss term.

Steps the real Trainer; before each optimizer update, recomputes gradients
of the same 5-term loss and checks finiteness per parameter leaf.  On the
first failure, recomputes per-term gradients separately to name the term,
and dumps the offending splat indices + their parameters.
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lidar_rt_tpu.config import Args, default_experiment
from lidar_rt_tpu.core import rays as rays_lib
from lidar_rt_tpu.data import build, synthetic
from lidar_rt_tpu.ops import tracer as tracer_lib
from lidar_rt_tpu.ops.binning import TileConfig
from lidar_rt_tpu.scene import compose
from lidar_rt_tpu.train import loop, losses

TH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
TW = int(sys.argv[2]) if len(sys.argv) > 2 else 256
K = int(sys.argv[3]) if len(sys.argv) > 3 else 128
ITERS = int(sys.argv[4]) if len(sys.argv) > 4 else 1000

frames, track = synthetic.generate(num_frames=4, height=64, width=2650)
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

TERMS = ("depth", "int_l1l2", "dssim", "bce", "cd", "reg")


def term_loss(params_bg, params_ac, batch, scene_, term):
    lw = losses.LossWeights(
        depth_l1=args.opt.lambda_depth_l1 * (term == "depth"),
        intensity_l1=args.opt.lambda_intensity_l1 * (term == "int_l1l2"),
        intensity_l2=args.opt.lambda_intensity_l2 * (term == "int_l1l2"),
        intensity_dssim=args.opt.lambda_intensity_dssim * (term == "dssim"),
        raydrop_bce=args.opt.lambda_raydrop_bce * (term == "bce"),
        cd=args.opt.lambda_cd * (term == "cd"),
        reg=args.opt.lambda_reg * (term == "reg"))
    bg = scene_.background.with_params(params_bg)
    sc = dataclasses.replace(scene_, background=bg)
    if params_ac is not None:
        sc = dataclasses.replace(sc,
                                 actors=scene_.actors.with_params(params_ac))
    bundle, _ = compose(sc, batch.frame)
    out = tracer_lib.render_frame(
        bundle, frames.grid, frames.width, batch.sensor2world,
        sc.background.active_sh_degree, cfg, bool(args.opt.use_rayhit))
    cd = None
    if term == "cd":
        stride = max(1, (frames.height * frames.width) // 16384)
        origin, dirs3 = rays_lib.range_rays(frames.grid, frames.width,
                                            batch.sensor2world)
        dirs_f = dirs3.reshape(-1, 3)[::stride]
        m = batch.gt_mask.reshape(-1)[::stride]
        pred = origin + dirs_f * out["depth"].reshape(-1)[::stride, None]
        gt = origin + dirs_f * batch.gt_depth.reshape(-1)[::stride, None]
        cd = losses.chamfer_loss(pred, m, gt, m)
    reg = losses.box_reg_loss(sc.background, None)
    if params_ac is not None:
        reg = reg + jnp.sum(jax.vmap(losses.box_reg_loss)(
            sc.actors, sc.tracks))
    lb = losses.render_losses(out["depth"], out["intensity"], out["raydrop"],
                              batch.gt_depth, batch.gt_intensity,
                              batch.gt_mask, lw, cd, reg)
    return lb.total


grad_fns = {t: jax.jit(jax.grad(
    lambda pb, pa, b, s, t=t: term_loss(pb, pa, b, s, t), argnums=(0, 1)))
    for t in TERMS}


def all_finite(tree):
    leaves = jax.tree.leaves(tree)
    return bool(jnp.all(jnp.array([jnp.all(jnp.isfinite(x))
                                   for x in leaves])))


@jax.jit
def total_grad(pb, pa, b, s):
    def f(pb, pa):
        return sum(term_loss(pb, pa, b, s, t) for t in TERMS)
    return jax.grad(f, argnums=(0, 1))(pb, pa)


for it in range(1, ITERS + 1):
    batch = loop.frame_batch(frames, trainer._next_frame())
    st = trainer.state
    pb = st.scene.background.params()
    pa = st.scene.actors.params() if st.scene.actors is not None else None
    g = total_grad(pb, pa, batch, st.scene)
    if not all_finite(g):
        print(f"iteration {it}: NON-FINITE total gradient", flush=True)
        for t in TERMS:
            gt_ = grad_fns[t](pb, pa, batch, st.scene)
            ok = all_finite(gt_)
            print(f"  term {t}: finite={ok}", flush=True)
            if not ok:
                for side, gg in zip(("bg", "ac"), gt_):
                    if gg is None:
                        continue
                    for name, leaf in gg._asdict().items() \
                            if hasattr(gg, "_asdict") else enumerate(gg):
                        a = np.asarray(leaf)
                        bad = ~np.isfinite(a)
                        if bad.any():
                            idx = np.unique(np.nonzero(bad)[0])[:10]
                            print(f"    {side}.{name}: {bad.sum()} bad, "
                                  f"splats {idx}", flush=True)
                            asset = (st.scene.background if side == "bg"
                                     else st.scene.actors)
                            p = asset.params()
                            for pn, pl in (p._asdict().items()
                                           if hasattr(p, "_asdict")
                                           else enumerate(p)):
                                arr = np.asarray(pl)
                                if arr.ndim >= 1 \
                                        and arr.shape[0] >= idx.max() + 1:
                                    print(f"      {pn}[{idx[0]}] = "
                                          f"{arr[idx[0]]}", flush=True)
        break
    # apply the real training step (params advance identically to prod)
    trainer.state, metrics = trainer.step_fn(trainer.state, batch)
    if it % 25 == 0:
        print(it, float(metrics["loss"]), flush=True)
else:
    print("no non-finite gradient found", flush=True)
