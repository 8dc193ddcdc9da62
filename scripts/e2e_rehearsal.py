"""Format-true end-to-end rehearsal: real workload shapes through the CLI.

Generates synthetic datasets in the REAL wire formats at the REAL shapes —
a Waymo TFRecord segment (64x2650, 2 returns, 50 frames, 3 moving actors;
waymo_loader/__init__.py:92-102) and a KITTI-360 bin/XML sequence (66x1030,
40 frames, 1 actor; kitti_loader/__init__.py:186-189) — then drives the
actual `train.py -dc ... -ec ...` -> `eval.py` CLI against them
(configs/rehearsal/*), and records metric tables + throughput into
E2E_r05.json (evidence copies under e2e_artifacts/).

Usage:
    python scripts/e2e_rehearsal.py gen           # build both datasets
    python scripts/e2e_rehearsal.py train waymo   # CLI training
    python scripts/e2e_rehearsal.py train kitti
    python scripts/e2e_rehearsal.py eval waymo
    python scripts/e2e_rehearsal.py eval kitti
    python scripts/e2e_rehearsal.py collect       # -> E2E_r04.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = "/tmp/e2e_data"
OUT = os.path.join(REPO, "output", "rehearsal")


def gen_waymo() -> None:
    from lidar_rt_tpu.core import rays as rays_lib
    from lidar_rt_tpu.data import synthetic, writers

    h, w, f_total = 64, 2650, 50
    rng = np.random.default_rng(7)

    # Street scene spanning the full azimuth circle: corridor walls,
    # scattered facades, three moving vehicles.
    walls = [
        synthetic.Box(np.array([25.0, -9.0, 2.5]),
                      np.array([50.0, 1.5, 5.0]), yaw=0.05, albedo=0.7),
        synthetic.Box(np.array([20.0, 8.5, 2.0]),
                      np.array([40.0, 1.5, 4.0]), yaw=-0.03, albedo=0.65),
        synthetic.Box(np.array([-30.0, -12.0, 3.0]),
                      np.array([25.0, 2.0, 6.0]), yaw=0.3, albedo=0.6),
        synthetic.Box(np.array([-22.0, 14.0, 2.5]),
                      np.array([30.0, 2.0, 5.0]), yaw=-0.2, albedo=0.75),
        synthetic.Box(np.array([55.0, 3.0, 4.0]),
                      np.array([3.0, 18.0, 8.0]), albedo=0.8),
        synthetic.Box(np.array([-5.0, 35.0, 3.0]),
                      np.array([20.0, 3.0, 6.0]), yaw=1.2, albedo=0.55),
        synthetic.Box(np.array([8.0, -30.0, 2.0]),
                      np.array([14.0, 2.5, 4.0]), yaw=-0.9, albedo=0.6),
        synthetic.Box(np.array([3.0, 18.0, 0.8]),
                      np.array([1.0, 1.0, 1.6]), albedo=0.9),
    ]
    actors = [
        synthetic.Box(np.array([12.0, -3.5, 0.85]),
                      np.array([4.6, 1.9, 1.7]), yaw=0.0, albedo=0.9),
        synthetic.Box(np.array([30.0, 3.2, 0.9]),
                      np.array([4.2, 1.8, 1.8]), yaw=3.1, albedo=0.85),
        synthetic.Box(np.array([-18.0, 2.8, 1.1]),
                      np.array([8.5, 2.4, 2.2]), yaw=0.1, albedo=0.8),
    ]
    velocities = [np.array([0.9, 0.02, 0.0]), np.array([-0.7, 0.0, 0.0]),
                  np.array([0.5, -0.01, 0.0])]
    scene = synthetic.SyntheticScene(
        walls=walls, ground_albedo=0.45, actor=actors[0],
        actor_velocity=velocities[0], extra_actors=actors[1:],
        extra_velocities=velocities[1:], max_range=75.0)

    # Waymo TOP lidar geometry: beam table (stored ascending like the real
    # proto), extrinsic with a yaw offset (exercises angle_offset parsing).
    beams = np.linspace(-0.31, 0.04, h)
    yaw_e = 0.05
    extrinsic = np.eye(4)
    extrinsic[0, 0] = np.cos(yaw_e)
    extrinsic[0, 1] = -np.sin(yaw_e)
    extrinsic[1, 0] = np.sin(yaw_e)
    extrinsic[1, 1] = np.cos(yaw_e)
    extrinsic[2, 3] = 2.1
    grid = rays_lib.SensorGrid.from_beams(
        np.asarray(beams, np.float32), pixel_offset=0.5, angle_offset=yaw_e)

    ego2world = np.tile(np.eye(4), (f_total, 1, 1))
    for f in range(f_total):
        ego2world[f, :3, 3] = [f * 0.55, 0.02 * f, 0.0]

    r1 = np.zeros((f_total, h, w), np.float32)
    i1 = np.zeros_like(r1)
    r2 = np.zeros_like(r1)
    i2 = np.zeros_like(r1)
    labels = []
    t0 = time.time()
    for f in range(f_total):
        s2w = ego2world[f] @ extrinsic
        r1[f], i1[f], r2[f], i2[f] = synthetic.render_frame_gt_dual(
            scene, grid, w, s2w, f)
        inv_e = np.linalg.inv(ego2world[f])
        frame_labels = []
        for a_i, (box, center) in enumerate(scene.moving_boxes(f)):
            c_ego = inv_e[:3, :3] @ center + inv_e[:3, 3]
            frame_labels.append((f"veh_{a_i}", c_ego,
                                 box.size[[0, 1, 2]], box.yaw))
        labels.append(frame_labels)
        if f % 10 == 0:
            print(f"  waymo frame {f}/{f_total} ({time.time()-t0:.0f}s)",
                  flush=True)

    path = writers.write_waymo_segment(
        os.path.join(DATA, "waymo"), ego2world=ego2world,
        extrinsic=extrinsic, beam_inclinations=beams,
        range1=r1, intensity1=i1, range2=r2, intensity2=i2,
        labels_per_frame=labels)
    print(f"wrote {path} "
          f"({os.path.getsize(path) / 1e6:.1f} MB, "
          f"hit rate r1 {(r1 > 0).mean():.2f} r2 {(r2 > 0).mean():.2f})")


def gen_kitti() -> None:
    from lidar_rt_tpu.core import rays as rays_lib
    from lidar_rt_tpu.data import kitti, synthetic, writers

    f_total = 40
    walls = [
        synthetic.Box(np.array([20.0, -7.0, 2.0]),
                      np.array([45.0, 1.2, 4.0]), yaw=0.02, albedo=0.7),
        synthetic.Box(np.array([15.0, 7.5, 1.8]),
                      np.array([35.0, 1.4, 3.6]), yaw=-0.04, albedo=0.6),
        synthetic.Box(np.array([-20.0, -10.0, 2.5]),
                      np.array([18.0, 2.0, 5.0]), yaw=0.4, albedo=0.65),
        synthetic.Box(np.array([45.0, 0.0, 3.0]),
                      np.array([2.5, 14.0, 6.0]), albedo=0.75),
        synthetic.Box(np.array([-2.0, 20.0, 1.5]),
                      np.array([10.0, 2.0, 3.0]), yaw=1.0, albedo=0.55),
    ]
    actor = synthetic.Box(np.array([10.0, -2.5, 0.8]),
                          np.array([4.3, 1.8, 1.6]), yaw=0.05, albedo=0.9)
    scene = synthetic.SyntheticScene(
        walls=walls, ground_albedo=0.4, actor=actor,
        actor_velocity=np.array([0.6, 0.0, 0.0]), max_range=79.0)

    grid = rays_lib.SensorGrid.from_bounds(
        kitti.H, (kitti.INC_BOTTOM, kitti.INC_TOP), pixel_offset=0.0,
        angle_offset=0.0)
    poses = np.tile(np.eye(4), (f_total, 1, 1))
    for f in range(f_total):
        poses[f, :3, 3] = [f * 0.5, 0.0, 1.73]

    r1 = np.zeros((f_total, kitti.H, kitti.W), np.float32)
    i1 = np.zeros_like(r1)
    boxes: dict[int, np.ndarray] = {}
    for f in range(f_total):
        r1[f], i1[f] = synthetic.render_frame_gt(scene, grid, kitti.W,
                                                 poses[f], f)
        center = actor.center + f * scene.actor_velocity
        t = np.eye(4)
        t[:3, :3] = actor.rotation() @ np.diag(actor.size)
        t[:3, 3] = center
        boxes[f] = t

    base = writers.write_kitti360_sequence(
        os.path.join(DATA, "kitti360"), seq="0000", sensor2world=poses,
        range1=r1, intensity1=i1, boxes=[("11", boxes)])
    print(f"wrote {base} (hit rate {(r1 > 0).mean():.2f})")


def run_cli(kind: str, which: str) -> float:
    dc = os.path.join(REPO, "configs", "rehearsal",
                      "waymo.yaml" if which == "waymo" else "kitti.yaml")
    ec = os.path.join(REPO, "configs", "rehearsal", "exp.yaml")
    script = os.path.join(REPO, "train.py" if kind == "train" else "eval.py")
    cmd = [sys.executable, script, "-dc", dc, "-ec", ec]
    if kind == "eval":
        cmd += ["-t", "all", "-e", "-i"]   # save metrics json + images
    env = dict(os.environ,
               PYTHONPATH=f"{REPO}:/root/.axon_site")
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    subprocess.run(cmd, check=True, cwd=REPO, env=env)
    dt = time.time() - t0
    print(f"{kind} {which}: {dt:.0f}s")
    return dt


def collect() -> None:
    import hashlib
    import shutil

    art = os.path.join(REPO, "e2e_artifacts")
    os.makedirs(art, exist_ok=True)
    rec = {"round": 5, "shapes": {"waymo": [50, 64, 2650, 2],
                                  "kitti360": [40, 66, 1030, 1]},
           "schedule": "4k iterations (30k reference schedule compressed "
                       "7.5x; densify/prune active to schedule end — the "
                       "round-5 root-cause fix for the post-2000 quality "
                       "decline; opacity reset 1000), UNet refine 40 "
                       "epochs", "results": {}}
    for which, scene_id in (("waymo", "we1"), ("kitti360", "ke1")):
        mdir = os.path.join(OUT, "exp", f"scene_{scene_id}")
        res_path = os.path.join(mdir, "metrics", "results_all.json")
        entry = {}
        if os.path.exists(res_path):
            with open(res_path) as f:
                entry["metrics_mean"] = json.load(f)["mean"]
            # results_all.json is under gitignored output/ — copy the
            # evidence into the committed artifact dir (VERDICT r4 #5).
            shutil.copy(res_path,
                        os.path.join(art, f"results_all_{which}.json"))
        unet = os.path.join(mdir, "models", "unet.npz")
        if os.path.exists(unet):
            with open(unet, "rb") as f:
                entry["unet_npz_sha256"] = hashlib.sha256(
                    f.read()).hexdigest()
            entry["unet_npz_bytes"] = os.path.getsize(unet)
        else:
            entry["unet_npz_sha256"] = None
        log_path = os.path.join(mdir, "logs", "log.json")
        if os.path.exists(log_path):
            shutil.copy(log_path, os.path.join(art, f"log_{which}.json"))
            with open(log_path) as f:
                log = json.load(f)
            hist = log["history"]
            # Held-out eval PSNR at every testing_iterations point — the
            # non-decreasing trajectory is the round-5 task-1 evidence.
            entry["eval_history"] = log.get("eval_history", [])
            # 'elapsed' is stamped on log-event entries only (every
            # log_every iterations); measure steady state across the
            # stamped entries past warmup.
            stamped = [h for h in hist if "elapsed" in h]
            if len(stamped) > 2:
                a, b = stamped[1], stamped[-1]
                span = b["elapsed"] - a["elapsed"]
                if span > 0:
                    its = (b["iteration"] - a["iteration"]) / span
                    entry["steady_state_it_per_s"] = round(its, 2)
            entry["final_loss"] = hist[-1]["loss"]
            entry["iterations_recorded"] = len(hist)
        rec["results"][which] = entry
    out = os.path.join(REPO, "E2E_r05.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "gen"
    if what == "gen":
        os.makedirs(DATA, exist_ok=True)
        gen_kitti()
        gen_waymo()
    elif what in ("train", "eval"):
        run_cli(what, sys.argv[2])
    elif what == "collect":
        collect()
    else:
        raise SystemExit(f"unknown command {what}")


if __name__ == "__main__":
    main()
