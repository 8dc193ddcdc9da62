"""Shipped config tree: every leaf parses and dispatches to its loader.

Mirrors the reference's per-scene configs (configs/waymo/dynamic/1.yaml etc.)
so the documented CLI is runnable the moment the datasets are present.
"""

import glob
import os

import pytest

from lidar_rt_tpu import cli
from lidar_rt_tpu.config import parse

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _leaves(sub):
    return sorted(glob.glob(os.path.join(REPO, "configs", sub, "*", "*.yaml")))


WAYMO = _leaves("waymo")
KITTI = _leaves("kitti360")


class TestConfigTree:
    def test_leaves_exist(self):
        assert len(WAYMO) == 8    # dynamic 1-4 + static 1-4
        assert len(KITTI) == 10   # dynamic 1-6 + static 1-4

    @pytest.mark.parametrize("path", WAYMO + KITTI)
    def test_parses_with_inheritance(self, path):
        prev = os.getcwd()
        os.chdir(REPO)   # parent_config paths are repo-relative
        try:
            args = parse(path)
        finally:
            os.chdir(prev)
        # Leaf fields.
        lo, hi = args.frame_length
        assert lo < hi
        assert len(list(args.eval_frames)) == 4
        assert all(lo <= f <= hi for f in args.eval_frames)
        assert str(args.scene_id)
        assert isinstance(bool(args.dynamic), bool)
        # Inherited experiment hyperparameters reach the leaf.
        assert float(args.opt.lambda_depth_l1) > 0
        assert int(args.opt.iterations) > 0
        # Scene base fields (reference waymo_base/kitti_base).
        if "waymo" in path:
            assert args.data_type == "Waymo"
        else:
            assert args.data_type == "KITTI"
            assert "kitti360" in str(args.source_dir)

    @pytest.mark.parametrize("path,loader", [(WAYMO[0], "waymo"),
                                             (KITTI[0], "kitti360")])
    def test_dispatches_to_loader(self, path, loader, monkeypatch):
        prev = os.getcwd()
        os.chdir(REPO)
        try:
            args = parse(path)
        finally:
            os.chdir(prev)
        seen = {}

        if loader == "waymo":
            from lidar_rt_tpu.data import waymo as mod
        else:
            from lidar_rt_tpu.data import kitti as mod

        def fake_load(src, a):
            seen["src"] = src
            return "FRAMES", None

        monkeypatch.setattr(mod, "load", fake_load)
        out = cli.load_dataset(args)
        assert out == ("FRAMES", None)
        assert seen["src"] == str(args.source_dir)
