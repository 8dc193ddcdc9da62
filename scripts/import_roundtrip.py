"""Reference-checkpoint import round-trip at rehearsal scale (VERDICT r3 #7).

tests/test_import.py proves the importer on fabricated tuples; this script
proves the *advertised workflow* — "evaluate / fine-tune a CUDA-trained
LiDAR-RT model on this engine" — end to end on a real trained scene:

  1. Export the trained rehearsal scene to a genuine reference-format
     .pth: torch.save((per-asset capture 12-tuples, iteration)) with the
     exact field layout gaussian_model.py:58-72 / gs_loader.py:236-241
     produce (alive rows only — the reference has no padded capacity).
  2. scripts/import_reference_ckpt.py converts it back (fresh scene
     skeleton from the data config + imported parameters).
  3. train.py --resume fine-tunes 200 iterations from the import.
  4. eval.py produces a metric table from the fine-tuned model.

Writes IMPORT_RT_r05.json {exported_pth, import, finetune, eval}.

Usage:  python scripts/import_roundtrip.py
(expects the rehearsal Waymo training to have run: output/rehearsal/)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DC = os.path.join(REPO, "configs", "rehearsal", "waymo.yaml")
EC = os.path.join(REPO, "configs", "rehearsal", "import_rt.yaml")
SRC_MODELS = os.path.join(REPO, "output", "rehearsal", "exp",
                          "scene_we1", "models")
OUT_ROOT = os.path.join(REPO, "output", "import_rt")
PTH = "/tmp/e2e_data/roundtrip_reference.pth"


def export_reference_pth() -> dict:
    """Trained rehearsal ckpt -> reference torch.save format."""
    import torch

    from lidar_rt_tpu.utils import checkpoint as ckpt_lib

    path = ckpt_lib.find_best(SRC_MODELS)
    if path is None:
        raise FileNotFoundError(f"no rehearsal checkpoint in {SRC_MODELS}")
    state, meta = ckpt_lib.load(path)
    scene = state.scene if hasattr(state, "scene") else state
    iteration = int(meta.get("iteration", 0))

    tuples = []
    for asset in scene.assets():
        alive = np.asarray(asset.alive)
        t = lambda a: torch.tensor(np.asarray(a)[alive])
        n = int(alive.sum())
        tuples.append((
            int(asset.active_sh_degree),
            t(asset.xyz),                       # _xyz (n, 3)
            t(asset.f_dc),                      # _features_dc (n, 1, 3)
            t(asset.f_rest),                    # _features_rest (n, 15, 3)
            t(asset.log_scale),                 # _scaling (n, 2)
            t(asset.quat),                      # _rotation (n, 4) wxyz
            t(asset.opacity_logit).reshape(-1, 1),  # _opacity (n, 1)
            torch.zeros(n),                     # max_radii2D
            torch.zeros(n, 1),                  # xyz_gradient_accum
            torch.zeros(n, 1),                  # denom
            {"state": {}, "param_groups": []},  # optimizer.state_dict()
            float(asset.extent),                # spatial_lr_scale
        ))
    torch.save((tuples, iteration), PTH)
    sizes = [int(tup[1].shape[0]) for tup in tuples]
    print(f"exported {path} -> {PTH}  (assets {sizes}, it {iteration})")
    return {"src_ckpt": path, "pth": PTH, "iteration": iteration,
            "asset_sizes": sizes}


def run(cmd: list[str]) -> float:
    import time
    env = dict(os.environ, PYTHONPATH=f"{REPO}:/root/.axon_site")
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    subprocess.run(cmd, check=True, cwd=REPO, env=env)
    return time.time() - t0


def main() -> None:
    rec = {"round": 5, "export": export_reference_pth()}
    py = sys.executable

    rec["import_s"] = round(run(
        [py, "scripts/import_reference_ckpt.py", "-dc", DC, "-ec", EC,
         "--pth", PTH]), 1)
    rec["finetune_s"] = round(run(
        [py, "train.py", "-dc", DC, "-ec", EC, "--resume"]), 1)
    rec["eval_s"] = round(run(
        [py, "eval.py", "-dc", DC, "-ec", EC, "-t", "all", "-e"]), 1)

    res = os.path.join(OUT_ROOT, "exp", "scene_we1", "metrics",
                       "results_all.json")
    with open(res) as f:
        rec["metrics_mean"] = json.load(f)["mean"]
    out = os.path.join(REPO, "IMPORT_RT_r05.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
