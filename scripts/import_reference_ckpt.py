"""Convert a reference (CUDA LiDAR-RT) checkpoint for use here.

    python scripts/import_reference_ckpt.py \
        -dc configs/waymo/dynamic/1.yaml -ec configs/exp.yaml \
        --pth /path/to/ckpt_it_30000_good.pth \
        [-o output/<task>/<exp>/models/ckpt_it_30000_good.npz]

Rebuilds the scene skeleton (actor tracks, capacities) from the same data
config the reference run used, swaps in the checkpoint's parameters
(utils/import_torch.py), and writes an .npz that `eval.py -m <out>` or
`train.py -m <out>` (fine-tune) accept directly.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-dc", "--data_config", required=True)
    p.add_argument("-ec", "--exp_config", required=True)
    p.add_argument("--pth", required=True, help="reference .pth checkpoint")
    p.add_argument("-o", "--out", default=None)
    p.add_argument("--headroom", type=float, default=1.5,
                   help="capacity headroom over the imported point counts "
                        "(densify room for fine-tuning)")
    args_ns = p.parse_args()

    from lidar_rt_tpu import cli
    from lidar_rt_tpu import config as config_lib
    from lidar_rt_tpu.data import build as build_lib
    from lidar_rt_tpu.utils import checkpoint as ckpt_lib
    from lidar_rt_tpu.utils import import_torch

    args = config_lib.parse(args_ns.data_config,
                            config_lib.parse(args_ns.exp_config))
    cli.set_seed(int(args.get("seed", 1)))
    frames, tracks = cli.load_dataset(args)
    template = build_lib.assemble_scene(frames, tracks, args)
    scene, iteration = import_torch.scene_from_reference(
        args_ns.pth, template, headroom=args_ns.headroom)

    out = args_ns.out
    if out is None:
        # Same layout as cli._model_dir (incl. the scene_<id> segment) so
        # `eval.py`/`train.py --resume` find_best discovers the import at
        # its default location (reference layout: gs_loader.py:22).
        model_dir = os.path.join(cli._model_dir(args), "models")
        out = os.path.join(model_dir, f"ckpt_it_{iteration}_good.npz")
    ckpt_lib.save(out, scene, {"iteration": iteration,
                               "imported_from": os.path.abspath(args_ns.pth)})
    alive = int(scene.background.num_alive)
    print(f"imported {args_ns.pth} @ iteration {iteration} -> {out}\n"
          f"  background {alive} pts / cap {scene.background.capacity}; "
          f"{scene.num_actors} actors")


if __name__ == "__main__":
    main()
