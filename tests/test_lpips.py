"""LPIPS pipeline (random weights): topology, metric axioms, weight hook."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_rt_tpu.eval import lpips as lpips_lib


@pytest.fixture(scope="module")
def params():
    return lpips_lib.init_params(jax.random.key(0))


class TestLpips:
    def test_feature_shapes_match_alexnet(self, params):
        x = jnp.zeros((1, 3, 64, 96))
        feats = lpips_lib._features(params, x)
        assert [f.shape[1] for f in feats] == lpips_lib.N_CHANNELS
        # AlexNet spatial schedule for 64x96 input: conv1 (k11 s4 p2) ->
        # floor((64+4-11)/4)+1 = 15 (x23), pool+conv2 -> 7x11,
        # pool+conv3 -> 3x5, conv4/5 keep 3x5.
        assert feats[0].shape[-2:] == (15, 23)
        assert feats[1].shape[-2:] == (7, 11)
        assert feats[4].shape[-2:] == (3, 5)

    def test_identity_is_zero_and_symmetric(self, params):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.uniform(-1, 1, (1, 3, 64, 64)), jnp.float32)
        b = jnp.asarray(rng.uniform(-1, 1, (1, 3, 64, 64)), jnp.float32)
        assert float(lpips_lib.lpips(params, a, a)[0]) == pytest.approx(0.0,
                                                                        abs=1e-9)
        d_ab = float(lpips_lib.lpips(params, a, b)[0])
        d_ba = float(lpips_lib.lpips(params, b, a)[0])
        assert d_ab > 0
        assert d_ab == pytest.approx(d_ba, rel=1e-5)

    def test_make_fn_with_params_and_env_hook(self, params, tmp_path,
                                              monkeypatch):
        fn = lpips_lib.make_lpips_fn(params=params)
        rng = np.random.default_rng(1)
        gt = rng.uniform(0, 1, (32, 48)).astype(np.float32)
        pred = np.clip(gt + rng.normal(0, 0.1, gt.shape), 0, 1).astype(
            np.float32)
        assert fn(gt, gt) == pytest.approx(0.0, abs=1e-9)
        assert fn(pred, gt) > 0

        # env-var npz hook round-trips
        path = str(tmp_path / "w.npz")
        np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
        monkeypatch.setenv(lpips_lib.ENV_VAR, path)
        fn2 = lpips_lib.make_lpips_fn()
        assert fn2 is not None
        assert fn2(pred, gt) == pytest.approx(fn(pred, gt), rel=1e-5)

        monkeypatch.setenv(lpips_lib.ENV_VAR, str(tmp_path / "missing.npz"))
        assert lpips_lib.make_lpips_fn() is None

    def test_convert_torch_layout(self, tmp_path):
        # fabricate torch-layout state dicts and check the converter
        layer_ids = [0, 3, 6, 8, 10]
        shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
                  (256, 384, 3, 3), (256, 256, 3, 3)]
        alex = {}
        for lid, s in zip(layer_ids, shapes):
            alex[f"features.{lid}.weight"] = np.zeros(s, np.float32)
            alex[f"features.{lid}.bias"] = np.zeros((s[0],), np.float32)
        lin = {f"{i}.1.weight": np.ones((1, c, 1, 1), np.float32)
               for i, c in enumerate(lpips_lib.N_CHANNELS)}
        out = str(tmp_path / "lpips.npz")
        lpips_lib.convert_torch_checkpoints(alex, lin, out)
        fn = lpips_lib.make_lpips_fn(weights_path=out)
        assert fn is not None
        img = np.random.default_rng(2).uniform(0, 1, (40, 40))
        assert np.isfinite(fn(img, img * 0.5))

    def test_runner_integration_defaults_none_without_weights(self,
                                                              monkeypatch):
        monkeypatch.delenv(lpips_lib.ENV_VAR, raising=False)
        assert lpips_lib.make_lpips_fn() is None

    def test_cli_drop_path_from_real_pth_files(self, tmp_path, capsys):
        # The documented offline drop: torch.save'd checkpoints ->
        # `python -m lidar_rt_tpu.eval.lpips a.pth l.pth out.npz` ->
        # finite metric.  Exercises torch.load + key remap end to end.
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(3)
        layer_ids = [0, 3, 6, 8, 10]
        shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
                  (256, 384, 3, 3), (256, 256, 3, 3)]
        alex = {}
        for lid, s in zip(layer_ids, shapes):
            alex[f"features.{lid}.weight"] = torch.tensor(
                rng.normal(0, 0.05, s).astype(np.float32))
            alex[f"features.{lid}.bias"] = torch.zeros(s[0])
        # richzhang v0.1 key layout (lin{i}.model.1.weight)
        lin = {f"lin{i}.model.1.weight":
               torch.rand(1, c, 1, 1) for i, c in
               enumerate(lpips_lib.N_CHANNELS)}
        a_pth, l_pth = str(tmp_path / "a.pth"), str(tmp_path / "l.pth")
        out = str(tmp_path / "lpips.npz")
        torch.save(alex, a_pth)
        torch.save(lin, l_pth)
        lpips_lib.main([a_pth, l_pth, out])
        assert "self-check lpips=" in capsys.readouterr().out
        fn = lpips_lib.make_lpips_fn(weights_path=out)
        img = rng.uniform(0, 1, (40, 40))
        assert np.isfinite(fn(img, img * 0.5))
