"""Command-line drivers: training and evaluation.

API-compatible with the reference entry points (train.py:504-531,
eval.py:527-559):

    python train.py -dc configs/<data>.yaml -ec configs/exp.yaml [-m ckpt] [-r]
    python eval.py  -dc ... -ec ... [-m ckpt] [-t train|test|all]

The data config adds a `dataset:` key (synthetic | kitti360 | waymo)
dispatched by `load_dataset` (the reference routes on the source_dir path
substring, lib/dataloader/__init__.py:10-22).
"""

from __future__ import annotations

import argparse
import json
import os
import random
import time

import jax
import numpy as np

from lidar_rt_tpu import config as config_lib
from lidar_rt_tpu.data import build as build_lib
from lidar_rt_tpu.utils import checkpoint as ckpt_lib
from lidar_rt_tpu.utils.record import Recorder


def set_seed(seed: int) -> None:
    """Determinism setup (train.py:51-64 — cuDNN toggles become no-ops on
    TPU; XLA is deterministic by default)."""
    random.seed(seed)
    np.random.seed(seed)


def load_dataset(args):
    """-> (LiDARFrames, list[ActorTrack] | None)."""
    name = str(args.get("dataset", "")).lower()
    src = str(args.get("source_dir", ""))
    if not name:
        name = ("waymo" if "waymo" in src
                else "kitti360" if "kitti" in src else "synthetic")
    if name == "synthetic":
        from lidar_rt_tpu.data import synthetic
        kw = args.get("synthetic")
        kw = kw.to_dict() if kw is not None else {}
        frames, track = synthetic.generate(**kw)
        return frames, ([track] if track is not None else None)
    if name == "kitti360":
        from lidar_rt_tpu.data import kitti
        return kitti.load(src, args)
    if name == "waymo":
        from lidar_rt_tpu.data import waymo
        return waymo.load(src, args)
    raise ValueError(f"unknown dataset {name!r}")


def _model_dir(args) -> str:
    """output/<task>/<exp>/scene_<id> — the reference's layout
    (train.py:83-85), so scenes sharing an experiment config don't clobber
    each other's checkpoints/metrics."""
    parts = [str(args.model_dir), str(args.task_name), str(args.exp_name)]
    sid = args.get("scene_id", "")
    if str(sid):
        parts.append(f"scene_{sid}")
    return os.path.join(*parts)


def _trace_cfg(args):
    """Tracer config from the `tracer:` yaml block.  Every fallback reads
    the flagship defaults (ops/tracer.FLAGSHIP_TILE / TraceConfig()) — one
    source of truth, asserted by tests/test_configs.py."""
    import dataclasses

    from lidar_rt_tpu.ops import tracer as tracer_lib
    from lidar_rt_tpu.ops.binning import TileConfig
    t = args.get("tracer")
    kw = t.to_dict() if t is not None else {}
    ft = tracer_lib.FLAGSHIP_TILE
    fd = tracer_lib.TraceConfig()
    tile = TileConfig(
        tile_h=int(kw.get("tile_h", ft.tile_h)),
        tile_w=int(kw.get("tile_w", ft.tile_w)),
        max_per_tile=int(kw.get("max_per_tile", ft.max_per_tile)),
        binner=str(kw.get("binner", ft.binner)),
        coarse_factor=int(kw.get("coarse_factor", ft.coarse_factor)),
        macro_cols=int(kw.get("macro_cols", ft.macro_cols)),
        approx_topk=bool(kw.get("approx_topk", ft.approx_topk)))
    cfg = tracer_lib.TraceConfig(
        tile=tile, exact_order=bool(kw.get("exact_order", fd.exact_order)),
        tile_batch=int(kw.get("tile_batch", fd.tile_batch)),
        ray_block=int(kw.get("ray_block", fd.ray_block)),
        fast_math=bool(kw.get("fast_math", fd.fast_math)),
        tail_passes=int(kw.get("tail_passes", fd.tail_passes)))
    # Warmup-K schedule (Trainer warmup_cfg): a larger candidate budget
    # until `warmup_until` (default densify_until_iter) absorbs the huge
    # pre-prune footprints — the reference's unbounded k-buffer re-launch
    # behavior (forward.cu:282-291) for early training.
    warmup_cfg = None
    if "warmup_max_per_tile" in kw:
        warmup_cfg = dataclasses.replace(
            cfg, tile=dataclasses.replace(
                tile, max_per_tile=int(kw["warmup_max_per_tile"])))
    warmup_until = kw.get("warmup_until")
    return cfg, warmup_cfg, (int(warmup_until)
                             if warmup_until is not None else None)


def main_train(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-dc", "--data_config", required=True)
    p.add_argument("-ec", "--exp_config", required=True)
    p.add_argument("-m", "--model_path", default=None,
                   help="checkpoint to resume from (reference train.py -m)")
    p.add_argument("-r", "--only_refine", action="store_true",
                   help="skip gaussian optimization; only refine the UNet "
                        "from the -m checkpoint (reference train.py "
                        "--only_refine)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the best checkpoint in model_dir")
    p.add_argument("--iterations", type=int, default=None)
    a = p.parse_args(argv)
    if a.only_refine and not (a.model_path or a.resume):
        p.error("-r/--only_refine needs -m (a trained model to refine)")

    args = config_lib.parse(a.data_config, config_lib.parse(a.exp_config))
    set_seed(int(args.get("seed", 1)))

    frames, tracks = load_dataset(args)
    model_dir = _model_dir(args)
    os.makedirs(model_dir, exist_ok=True)
    recorder = Recorder(os.path.join(model_dir, "logs"))

    from lidar_rt_tpu.train import loop as loop_lib
    scene = build_lib.assemble_scene(frames, tracks, args)
    cfg, warmup_cfg, warmup_until = _trace_cfg(args)
    trainer = loop_lib.Trainer(scene, frames, args, cfg,
                               warmup_cfg=warmup_cfg,
                               warmup_until=warmup_until)
    trainer.snapshot_dir = os.path.join(model_dir, "snapshots")
    if bool(args.get("detect_anomaly", False)):
        from lidar_rt_tpu.utils.profiling import enable_anomaly_detection
        enable_anomaly_detection(True)

    if a.resume or a.model_path:
        path = a.model_path or ckpt_lib.find_best(os.path.join(model_dir,
                                                               "models"))
        if path is None and a.only_refine:
            # --only_refine without an actual checkpoint would silently
            # refine a freshly initialized scene.
            p.error(f"--only_refine: no checkpoint found under "
                    f"{model_dir}/models (and no -m given)")
        if path:
            state, meta = ckpt_lib.load(path)
            from lidar_rt_tpu.scene import Scene
            if isinstance(state, Scene):
                # A bare Scene (e.g. a reference checkpoint converted by
                # scripts/import_reference_ckpt.py): rebuild the trainer
                # around it — fresh optimizer moments, imported parameters.
                trainer = loop_lib.Trainer(state, frames, args, cfg,
                                           warmup_cfg=warmup_cfg,
                                           warmup_until=warmup_until)
                trainer.snapshot_dir = os.path.join(model_dir, "snapshots")
            else:
                trainer.state = jax.tree.map(lambda x: x, state)
            trainer.iteration = int(meta.get("iteration", 0))
            print(f"resumed from {path} @ iteration {trainer.iteration}")

    total = a.iterations or int(args.opt.iterations)
    if a.only_refine:
        total = trainer.iteration   # skip the optimization loop entirely
    testing_every = int(args.get("testing_iterations", 1000))
    saving = set(args.get("saving_iterations", []))
    best_psnr = -1.0
    eval_history: list[dict] = []

    t0 = time.time()
    logged = 0
    _loss_keys = ("loss", "depth", "intensity", "raydrop", "cd", "reg")
    while trainer.iteration < total:
        chunk = min(testing_every, total - trainer.iteration)
        hist = trainer.run(iterations=chunk, log_every=100)
        recorder.step = trainer.iteration
        # Feed every new per-iteration entry (the reference updates its
        # SmoothedValue windows per iteration, train.py:263-269) — loss
        # keys only, so bookkeeping fields (elapsed/alive/iteration) never
        # enter the smoothing windows.
        for entry in hist[logged:]:
            recorder.update_loss_stats(
                {k: entry[k] for k in _loss_keys if k in entry})
        logged = len(hist)
        recorder.record("train")

        # periodic eval + best-checkpoint retention (train.py:328-380)
        eval_frames = frames.eval_frames or [0]
        from lidar_rt_tpu.train.losses import psnr as psnr_fn
        import jax.numpy as jnp
        psnrs = []
        for f in eval_frames:
            out = trainer.render_eval(f)
            mask = frames.mask(f)
            psnrs.append(float(psnr_fn(
                jnp.clip(out["intensity"], 0, 1), frames.intensity(f),
                mask)))
        mean_psnr = float(np.mean(psnrs))
        is_best = mean_psnr > best_psnr
        best_psnr = max(best_psnr, mean_psnr)
        it = trainer.iteration
        eval_history.append({"iteration": it, "eval_psnr": mean_psnr,
                             "per_frame": [round(x, 4) for x in psnrs],
                             "alive": hist[-1]["alive"]})

        # rendered snapshots (train.py:271-302 visual_interval equivalent)
        from lidar_rt_tpu.utils.export import colormap, write_png
        f_vis = eval_frames[0]
        vis = trainer.render_eval(f_vis)
        gt_d = np.asarray(frames.depth(f_vis))
        scale = max(float(gt_d.max()), 1e-6)
        img = np.concatenate([
            colormap(np.asarray(vis["depth"]) / scale),
            colormap(gt_d / scale),
            colormap(np.clip(np.asarray(vis["intensity"]), 0, 1)),
        ], axis=0)
        os.makedirs(os.path.join(model_dir, "visuals"), exist_ok=True)
        write_png(os.path.join(model_dir, "visuals",
                               f"it_{it:06d}.png"), img)
        if is_best or it in saving or it >= total:
            ckpt_lib.retain_best(
                os.path.join(model_dir, "models"), it, trainer.state,
                is_best, {"iteration": it, "eval_psnr": mean_psnr})
        from lidar_rt_tpu.utils import console
        console.log(
            f"[{time.time()-t0:8.1f}s] it {it}/{total} "
            f"loss {hist[-1]['loss']:.4f} eval intensity PSNR "
            f"{console.bold(f'{mean_psnr:.2f}')}"
            f"{console.green(' *best*') if is_best else ''} "
            f"alive {hist[-1]['alive']}")

    def _dump_log() -> None:
        # training + densification history (train.py:450-501 log.json
        # parity).  Written before AND after the refine phase so the eval
        # trajectory survives a refine-stage crash.
        with open(os.path.join(model_dir, "logs", "log.json"), "w") as fp:
            json.dump({"history": trainer.history,
                       "densify": trainer.densify_log,
                       "eval_history": eval_history}, fp, indent=1)

    _dump_log()

    # ray-drop refinement phase (train.py:386-447); -r forces it
    if a.only_refine or bool(args.refine.use_refine):
        from lidar_rt_tpu.train import refine as refine_lib
        train_ids = frames.train_frames or list(range(frames.num_frames))
        use_spatial = bool(args.refine.use_spatial)
        inputs, labels = refine_lib.collect_inputs(
            lambda f: trainer.render_eval(f), frames, train_ids, use_spatial)
        model, variables, hist = refine_lib.train_unet(
            inputs, labels, epochs=int(args.refine.epochs),
            batch_size=int(args.refine.batch_size),
            lr=float(args.refine.lr),
            use_rot=bool(args.refine.get("use_rot", False)))
        ckpt_lib.save(os.path.join(model_dir, "models", "unet.npz"),
                      variables, {"in_ch": inputs.shape[-1],
                                  "final_loss": hist[-1]})
        print(f"unet refinement: {hist[0]:.4f} -> {hist[-1]:.4f}")

    _dump_log()
    _write_log_plot(os.path.join(model_dir, "logs", "log.png"),
                    trainer.history, trainer.densify_log)
    recorder.close()


def _write_log_plot(path: str, history: list[dict],
                    densify_log: list[dict]) -> None:
    """logs/log.png: loss curve + surfel-count/densify-event history — the
    reference's training plot (train.py:450-501, depth MSE + clone/split/
    prune stacks), on our recorded quantities."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    its = [h["iteration"] for h in history if "loss" in h]
    loss = [h["loss"] for h in history if "loss" in h]
    fig, ax1 = plt.subplots(figsize=(8, 6))
    ax1.plot(its, loss, color="tab:blue", lw=0.8)
    ax1.set_xlabel("iteration")
    ax1.set_ylabel("loss", color="tab:blue")
    ax1.set_yscale("log")
    ax2 = ax1.twinx()
    alive_pts = [(h["iteration"], h["alive"]) for h in history
                 if "alive" in h]
    if alive_pts:
        ax2.plot(*zip(*alive_pts), color="tab:red")
        ax2.set_ylabel("alive surfels", color="tab:red")
    for ev in densify_log:
        ax1.axvline(ev.get("iteration", 0), color="gray", alpha=0.15, lw=0.5)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def main_eval(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-dc", "--data_config", required=True)
    p.add_argument("-ec", "--exp_config", required=True)
    p.add_argument("-m", "--model_path", default=None)
    p.add_argument("-un", "--unet_path", default=None)
    p.add_argument("-t", "--eval_type", default="test",
                   choices=["train", "test", "all"])
    # Artifact switches (reference eval.py:549-556).
    p.add_argument("-e", "--save_eval", action="store_true",
                   help="write results_all.json + per-frame metrics")
    p.add_argument("-i", "--save_image", action="store_true",
                   help="write gt/pred PNG snapshots + depth animation")
    p.add_argument("-p", "--save_pcd", action="store_true",
                   help="write gt/pred PLY pairs")
    p.add_argument("-u", "--use_gt_mask", action="store_true")
    a = p.parse_args(argv)

    args = config_lib.parse(a.data_config, config_lib.parse(a.exp_config))
    frames, tracks = load_dataset(args)
    model_dir = _model_dir(args)

    path = a.model_path or ckpt_lib.find_best(os.path.join(model_dir,
                                                           "models"))
    if path is None:
        raise FileNotFoundError(f"no checkpoint under {model_dir}/models")
    state, meta = ckpt_lib.load(path)
    scene = state.scene if hasattr(state, "scene") else state
    print(f"evaluating {path} (meta {meta})")

    unet_apply = None
    unet_path = a.unet_path or os.path.join(model_dir, "models", "unet.npz")
    if os.path.exists(unet_path):
        from lidar_rt_tpu.models.unet import RayDropUNet
        from lidar_rt_tpu.train.refine import apply_unet
        variables, umeta = ckpt_lib.load(unet_path)
        model = RayDropUNet(in_ch=int(umeta.get("in_ch", 3)))
        use_spatial = int(umeta.get("in_ch", 3)) > 3

        def unet_apply(f, out):  # noqa: F811
            if use_spatial:
                import jax.numpy as jnp
                origin, dirs = frames.rays(f)
                ray_o = jnp.broadcast_to(origin, dirs.shape)
                return apply_unet(model, variables, out["raydrop"],
                                  out["intensity"], out["depth"], ray_o,
                                  dirs)
            return apply_unet(model, variables, out["raydrop"],
                              out["intensity"], out["depth"])
        print(f"using unet {unet_path}")

    from lidar_rt_tpu.eval.runner import EvalRunner
    runner = EvalRunner(scene, frames, args, _trace_cfg(args)[0],
                        unet_apply=unet_apply, use_gt_mask=a.use_gt_mask)
    out_dir = os.path.join(model_dir, "metrics")
    results = runner.run(a.eval_type, out_dir, save_images=a.save_image,
                         save_pcds=a.save_pcd, save_metrics=a.save_eval)
    print(json.dumps(results["mean"], indent=2))
