"""End-to-end CLI drivers on a tiny synthetic scene.

Covers the reference's documented command surface (docs/TRAIN.md,
docs/EVAL.md): train -> checkpoint/log artifacts, eval with the -e/-i/-p
artifact switches, resume, and -r/--only_refine.
"""

import json
import os

import numpy as np
import pytest

from lidar_rt_tpu import cli

H, W = 8, 64


@pytest.fixture(scope="module")
def configs(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exp = root / "exp.yaml"
    exp.write_text(f"""
parent_config: "{repo}/configs/exp.yaml"
model_dir: "{root}/output"
task_name: clitest
testing_iterations: 2
saving_iterations: [4]
opt:
  iterations: 4
  densify_from_iter: 100
  rebin_interval: 0
refine:
  use_refine: false
  use_spatial: false
  epochs: 1
  batch_size: 2
tracer:
  tile_h: {H}
  tile_w: {W}
  max_per_tile: 32
  tile_batch: 2
""")
    data = root / "data.yaml"
    data.write_text(f"""
dataset: synthetic
scene_id: s1
synthetic:
  num_frames: 2
  height: {H}
  width: {W}
""")
    return str(data), str(exp), str(root / "output")


@pytest.fixture(scope="module")
def trained(configs):
    data, exp, out = configs
    cli.main_train(["-dc", data, "-ec", exp])
    return configs


class TestTrainCLI:
    def test_writes_artifacts(self, trained):
        _, _, out = trained
        mdir = os.path.join(out, "clitest", "exp", "scene_s1")
        assert os.path.isdir(mdir), "output nests under scene_<id>"
        names = os.listdir(os.path.join(mdir, "models"))
        assert any(n.startswith("ckpt_it_") for n in names)
        with open(os.path.join(mdir, "logs", "log.json")) as f:
            log = json.load(f)
        # per-iteration history (the reference records every iteration)
        assert len(log["history"]) == 4
        assert os.path.exists(os.path.join(mdir, "logs", "log.png"))
        assert os.listdir(os.path.join(mdir, "visuals"))

    def test_resume_continues(self, trained):
        data, exp, out = trained
        cli.main_train(["-dc", data, "-ec", exp, "--resume",
                        "--iterations", "6"])
        mdir = os.path.join(out, "clitest", "exp", "scene_s1")
        with open(os.path.join(mdir, "logs", "log.json")) as f:
            hist = json.load(f)["history"]
        assert hist[-1]["iteration"] == 6

    def test_only_refine_requires_model(self, configs):
        data, exp, _ = configs
        with pytest.raises(SystemExit):
            cli.main_train(["-dc", data, "-ec", exp, "-r"])

    def test_only_refine_skips_training(self, trained):
        data, exp, out = trained
        mdir = os.path.join(out, "clitest", "exp", "scene_s1")
        ckpt = [os.path.join(mdir, "models", n)
                for n in os.listdir(os.path.join(mdir, "models"))
                if n.startswith("ckpt_it_")][0]
        cli.main_train(["-dc", data, "-ec", exp, "-m", ckpt, "-r"])
        # -r forces the UNet phase even with refine.use_refine false, and
        # runs zero optimization iterations.
        assert os.path.exists(os.path.join(mdir, "models", "unet.npz"))


class TestEvalCLI:
    def test_flags_gate_artifacts(self, trained, capsys):
        data, exp, out = trained
        mdir = os.path.join(out, "clitest", "exp", "scene_s1")
        metrics = os.path.join(mdir, "metrics")

        # no flags: metrics printed but nothing persisted (eval.py -e/-i/-p
        # default off)
        cli.main_eval(["-dc", data, "-ec", exp, "-t", "train"])
        printed = capsys.readouterr().out
        assert "depth" in printed
        assert not os.path.exists(os.path.join(metrics, "results_all.json"))

        cli.main_eval(["-dc", data, "-ec", exp, "-t", "train", "-e", "-i",
                       "-p"])
        assert os.path.exists(os.path.join(metrics, "results_all.json"))
        imgs = os.listdir(os.path.join(metrics, "images"))
        assert any(n.endswith(".png") for n in imgs)
        assert any(n.endswith(".ply") for n in imgs)
        with open(os.path.join(metrics, "results_all.json")) as f:
            res = json.load(f)
        assert np.isfinite(res["mean"]["depth"]["rmse"])
