"""End-to-end training on the synthetic scene: the full spine.

The acceptance criterion mirrors the reference's in-training eval
(train.py:328-368): after optimization, masked depth error and intensity
PSNR on a held-out frame must improve substantially over the initial render.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from lidar_rt_tpu.config import default_experiment
from lidar_rt_tpu.data import build, synthetic
from lidar_rt_tpu.ops import tracer as tracer_lib
from lidar_rt_tpu.ops.binning import TileConfig
from lidar_rt_tpu.train import loop


def _small_args():
    args = default_experiment()
    d = args.to_dict()
    d["opt"].update(
        densify_from_iter=15, densification_interval=20,
        densify_until_iter=70, opacity_reset_interval=10_000,
        cd_max_points=1024, iterations=80, sh_increase_interval=30)
    d["model"].update(obj_pt_num=256, voxel_size=0.3)
    from lidar_rt_tpu.config import Args
    return Args(d)


ITERS = 80


@pytest.fixture(scope="module")
def trained():
    frames, track = synthetic.generate(num_frames=3, height=16, width=128)
    args = _small_args()
    scene = build.assemble_scene(frames, [track], args,
                                 capacity_headroom=1.5)
    cfg = tracer_lib.TraceConfig(
        tile=TileConfig(tile_h=16, tile_w=64, max_per_tile=128),
        tile_batch=2)
    trainer = loop.Trainer(scene, frames, args, cfg)

    f_eval = frames.eval_frames[0] if frames.eval_frames else 0
    before = trainer.render_eval(f_eval)
    history = trainer.run(iterations=ITERS, log_every=10)
    after = trainer.render_eval(f_eval)
    return frames, f_eval, before, after, history, trainer


class TestTrainingEndToEnd:
    def test_loss_decreases(self, trained):
        _, _, _, _, history, _ = trained
        # per-log losses are single random frames: compare smoothed ends
        first = np.mean([h["loss"] for h in history[:3]])
        last = np.mean([h["loss"] for h in history[-3:]])
        assert last < first

    def test_depth_error_improves(self, trained):
        frames, f_eval, before, after, _, _ = trained
        gt = np.asarray(frames.depth(f_eval))
        mask = gt > 0
        err_before = np.abs(np.asarray(before["depth"]) - gt)[mask].mean()
        err_after = np.abs(np.asarray(after["depth"]) - gt)[mask].mean()
        assert err_after < err_before

    def test_intensity_improves(self, trained):
        frames, f_eval, before, after, _, _ = trained
        gt = np.asarray(frames.intensity(f_eval))
        mask = np.asarray(frames.mask(f_eval))

        def mse(img):
            return ((np.asarray(img) - gt) ** 2)[mask].mean()

        assert mse(after["intensity"]) < mse(before["intensity"])

    def test_raydrop_separates(self, trained):
        frames, f_eval, _, after, _, _ = trained
        mask = np.asarray(frames.mask(f_eval))
        rd = np.asarray(after["raydrop"])
        # dropped rays should get higher drop probability than hit rays
        # (weak margin: this fixture runs only ~80 iterations of a 30k
        # schedule; the direction of separation is what matters)
        assert rd[~mask].mean() > rd[mask].mean() + 0.02

    def test_densification_ran(self, trained):
        *_, trainer = trained
        # at least one densify pass should have changed the alive count
        # away from the seeded value OR produced stats reset
        assert trainer.iteration == ITERS
        assert int(trainer.state.scene.background.num_alive) > 0

    def test_state_remains_finite(self, trained):
        *_, trainer = trained
        bg = trainer.state.scene.background
        for leaf in (bg.xyz, bg.log_scale, bg.quat, bg.opacity_logit,
                     bg.f_dc):
            assert np.isfinite(np.asarray(leaf)).all()
