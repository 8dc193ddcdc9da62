"""Checkpoint save/restore roundtrips."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from lidar_rt_tpu.config import default_experiment
from lidar_rt_tpu.scene import Scene, from_points
from lidar_rt_tpu.train import loop
from lidar_rt_tpu.utils import checkpoint


def _scene():
    rng = np.random.default_rng(0)
    bg = from_points(jnp.asarray(rng.normal(size=(20, 3)), jnp.float32),
                     jnp.full((20, 3), 0.5), jax.random.key(0), 32)
    return Scene(background=bg)


class TestCheckpoint:
    def test_train_state_roundtrip(self, tmp_path):
        scene = _scene()
        args = default_experiment()
        state, opt_bg, _ = loop.init_train_state(scene, args.opt)
        path = str(tmp_path / "ckpt.npz")
        checkpoint.save(path, state, {"iteration": 123})
        restored, meta = checkpoint.load(path)
        assert meta["iteration"] == 123
        np.testing.assert_array_equal(
            np.asarray(restored.scene.background.xyz),
            np.asarray(state.scene.background.xyz))
        # optimizer state round-trips (incl. nested optax structures)
        orig_mu = np.asarray(
            state.opt_state_bg.inner_states["xyz"].inner_state[0].mu["xyz"])
        rest_mu = np.asarray(
            restored.opt_state_bg.inner_states["xyz"].inner_state[0]
            .mu["xyz"])
        np.testing.assert_array_equal(orig_mu, rest_mu)
        # restored state is usable: one training step runs
        from lidar_rt_tpu.data import synthetic
        frames, _ = synthetic.generate(num_frames=2, height=16, width=128)
        from lidar_rt_tpu.ops import tracer as tracer_lib
        from lidar_rt_tpu.ops.binning import TileConfig
        cfg = tracer_lib.TraceConfig(
            tile=TileConfig(tile_h=16, tile_w=64, max_per_tile=32),
            tile_batch=2)
        step = loop.make_train_step(frames, args, cfg, opt_bg, None)
        restored2 = loop.TrainState(
            scene=Scene(background=restored.scene.background),
            opt_state_bg=restored.opt_state_bg,
            stats_bg=restored.stats_bg, key=restored.key)
        _, metrics = step(restored2, loop.frame_batch(frames, 0))
        assert np.isfinite(float(metrics["loss"]))

    def test_best_retention(self, tmp_path):
        d = str(tmp_path)
        state = {"x": jnp.arange(3)}
        checkpoint.retain_best(d, 100, state, is_best=False)
        checkpoint.retain_best(d, 200, state, is_best=True)
        assert checkpoint.find_best(d).endswith("ckpt_it_200_good.npz")
        checkpoint.retain_best(d, 300, state, is_best=True)
        names = sorted(os.listdir(d))
        assert "ckpt_it_200_good.npz" not in names  # stale _good GC'd
        assert checkpoint.find_best(d).endswith("ckpt_it_300_good.npz")
        # plain checkpoints survive
        assert "ckpt_it_100.npz" in names


class TestFailureDetection:
    def test_guard_finite_snapshots_and_raises(self, tmp_path):
        import pytest as _pytest
        from lidar_rt_tpu.utils import profiling, checkpoint as ckpt
        state = {"x": jnp.arange(4.0)}
        path = str(tmp_path / "snap.npz")
        # finite metrics: no-op
        profiling.guard_finite({"loss": 1.0}, state, path)
        assert not os.path.exists(path)
        with _pytest.raises(FloatingPointError, match="non-finite"):
            profiling.guard_finite({"loss": float("nan")}, state, path,
                                   context="it 7")
        restored, meta = ckpt.load(path)
        assert "nan" in meta["reason"] or "loss" in meta["reason"]
        np.testing.assert_array_equal(np.asarray(restored["x"]),
                                      np.arange(4.0))
