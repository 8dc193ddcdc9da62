"""Eval metrics parity and eval runner; UNet shape/training sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_rt_tpu.eval import metrics


class TestSSIMSkimage:
    def test_identical(self):
        img = np.random.default_rng(0).uniform(size=(24, 48))
        assert metrics.ssim_skimage(img, img, 1.0) == pytest.approx(1.0,
                                                                    abs=1e-9)

    def test_matches_formula_on_constant_shift(self):
        rng = np.random.default_rng(1)
        a = rng.uniform(size=(32, 32))
        b = a + 0.1
        s = metrics.ssim_skimage(a, b, data_range=float(b.max() - b.min()))
        assert 0.5 < s < 1.0


class TestImageMetrics:
    def test_depth_metrics_values(self):
        gt = np.full((16, 16), 10.0)
        pred = np.full((16, 16), 12.0)
        m = metrics.depth_metrics(gt, pred)
        assert m["rmse"] == pytest.approx(2.0)
        assert m["mae"] == pytest.approx(2.0)
        assert m["medae"] == pytest.approx(2.0)
        assert m["psnr"] == pytest.approx(10 * np.log10(80 ** 2 / 4.0))

    def test_clamping(self):
        gt = np.array([[100.0, 0.0]])
        pred = np.array([[90.0, 0.0]])
        m = metrics.depth_metrics(gt, pred, max_depth=80.0)
        assert m["rmse"] == pytest.approx(0.0, abs=1e-9)  # both clamp to 80

    def test_raydrop_metrics(self):
        gt = np.array([1.0, 1.0, 0.0, 0.0])
        pred = np.array([0.9, 0.2, 0.1, 0.8])
        m = metrics.raydrop_metrics(gt, pred, threshold=0.4)
        assert m["acc"] == pytest.approx(0.5)
        # TP=1 FP=1 FN=1 -> P=R=0.5 -> F1=0.5
        assert m["f1"] == pytest.approx(0.5)

    def test_points_metrics_identity(self):
        pts = np.random.default_rng(2).normal(size=(500, 3))
        m = metrics.points_metrics(pts, pts)
        assert m["chamfer_dist"] == pytest.approx(0.0, abs=1e-9)
        assert m["fscore"] == pytest.approx(1.0)

    def test_points_fscore_squared_convention(self):
        # offset 0.21: squared = 0.0441 < 0.05 -> "hit" under the
        # reference's squared-distance threshold convention
        a = np.zeros((10, 3))
        b = a + np.array([0.21, 0, 0])
        m = metrics.points_metrics(a, b)
        assert m["fscore"] == pytest.approx(1.0)
        b2 = a + np.array([0.23, 0, 0])  # squared 0.0529 > 0.05
        m2 = metrics.points_metrics(a, b2)
        assert m2["fscore"] == 0.0


class TestEvalRunner:
    def test_runner_on_synthetic(self, tmp_path):
        from lidar_rt_tpu.config import default_experiment
        from lidar_rt_tpu.data import build, synthetic
        from lidar_rt_tpu.eval.runner import EvalRunner
        from lidar_rt_tpu.ops import tracer as tracer_lib
        from lidar_rt_tpu.ops.binning import TileConfig

        frames, track = synthetic.generate(num_frames=2, height=16,
                                           width=128)
        args = default_experiment()
        scene = build.assemble_scene(frames, None, args,
                                     capacity_headroom=1.0)
        cfg = tracer_lib.TraceConfig(
            tile=TileConfig(tile_h=16, tile_w=64, max_per_tile=64),
            tile_batch=2)
        runner = EvalRunner(scene, frames, args, cfg, use_gt_mask=True)
        results = runner.run("all", str(tmp_path))
        assert results["num_frames"] == 2
        mean = results["mean"]
        assert np.isfinite(mean["depth"]["rmse"])
        assert 0 <= mean["raydrop"]["acc"] <= 1
        assert (tmp_path / "results_all.json").exists()
        # untrained init render with gt mask: depth rmse should at least be
        # bounded by the clamp range
        assert mean["depth"]["rmse"] < 80.0

    def test_runner_with_tail_passes(self, tmp_path):
        """The eval quality knob (tracer: tail_passes) must run through
        the jitted eval path end to end."""
        from lidar_rt_tpu.config import default_experiment
        from lidar_rt_tpu.data import build, synthetic
        from lidar_rt_tpu.eval.runner import EvalRunner
        from lidar_rt_tpu.ops import tracer as tracer_lib
        from lidar_rt_tpu.ops.binning import TileConfig

        frames, _ = synthetic.generate(num_frames=2, height=16, width=128)
        args = default_experiment()
        scene = build.assemble_scene(frames, None, args,
                                     capacity_headroom=1.0)
        cfg = tracer_lib.TraceConfig(
            tile=TileConfig(tile_h=16, tile_w=64, max_per_tile=32),
            tile_batch=2, tail_passes=1)
        runner = EvalRunner(scene, frames, args, cfg, use_gt_mask=True)
        results = runner.run("test", str(tmp_path))
        assert np.isfinite(results["mean"]["depth"]["rmse"])


class TestUNet:
    def test_forward_shapes_and_range(self):
        from lidar_rt_tpu.models.unet import RayDropUNet
        model = RayDropUNet(in_ch=3)
        x = jnp.zeros((1, 16, 64, 3))
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        y = model.apply(variables, x, train=False)
        assert y.shape == (1, 16, 64, 1)
        assert float(y.min()) >= 0 and float(y.max()) <= 1

    def test_nondivisible_spatial_dims(self):
        # 66-row rasters don't divide by 16; skip connections must pad
        from lidar_rt_tpu.models.unet import RayDropUNet
        model = RayDropUNet(in_ch=3)
        x = jnp.zeros((1, 66, 120, 3))
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        y = model.apply(variables, x, train=False)
        assert y.shape == (1, 66, 120, 1)

    def test_refinement_learns_mask(self):
        from lidar_rt_tpu.train import refine
        rng = np.random.default_rng(0)
        # toy task: drop mask == (depth channel > 0.5)
        n, h, w = 4, 16, 32
        inputs = rng.uniform(size=(n, h, w, 3)).astype(np.float32)
        labels = (inputs[..., 2:3] > 0.5).astype(np.float32)
        model, variables, hist = refine.train_unet(
            inputs, labels, epochs=24, batch_size=2, lr=3e-3)
        assert hist[-1] < 0.5 * hist[0]
        # Accuracy over ALL frames: eval-mode BatchNorm running stats are
        # noisy on a 4-sample toy set, so a single frame's accuracy can
        # swing +-0.15 with benign float-scheduling differences.
        accs = []
        for f in range(n):
            out = refine.apply_unet(model, variables,
                                    jnp.asarray(inputs[f, ..., 0]),
                                    jnp.asarray(inputs[f, ..., 1]),
                                    jnp.asarray(inputs[f, ..., 2]))
            pred = np.asarray(out) > 0.5
            accs.append((pred == (labels[f, ..., 0] > 0.5)).mean())
        assert np.mean(accs) > 0.75, accs


class TestEvalArtifacts:
    def test_images_and_second_return(self, tmp_path):
        from lidar_rt_tpu.config import default_experiment
        from lidar_rt_tpu.data import build, synthetic
        from lidar_rt_tpu.eval.runner import EvalRunner
        from lidar_rt_tpu.ops import tracer as tracer_lib
        from lidar_rt_tpu.ops.binning import TileConfig

        frames, _ = synthetic.generate(num_frames=2, height=16, width=128)
        # fabricate a second return (shifted copy) to exercise the path
        frames.range2 = np.where(frames.range1 > 0, frames.range1 + 2.0, 0)
        frames.intensity2 = frames.intensity1 * 0.5
        args = default_experiment()
        scene = build.assemble_scene(frames, None, args,
                                     capacity_headroom=1.0)
        cfg = tracer_lib.TraceConfig(
            tile=TileConfig(tile_h=16, tile_w=64, max_per_tile=64),
            tile_batch=2, engine="jax")
        runner = EvalRunner(scene, frames, args, cfg, use_gt_mask=True)
        results = runner.run("all", str(tmp_path), save_images=True)
        assert "depth_return2" in results["mean"]
        assert np.isfinite(results["mean"]["depth_return2"]["rmse"])
        import os
        imgs = os.listdir(tmp_path / "images")
        assert any(n.endswith(".png") for n in imgs)
        assert any(n.startswith("pred_") for n in imgs)
