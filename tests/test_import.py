"""Importing reference (torch .pth) checkpoints: utils/import_torch.py.

The reference saves torch.save((per-asset capture tuples, iteration))
(gs_loader.py:236-241, gaussian_model.py:58-72); these tests fabricate that
exact format and check the parameters arrive bit-true in a renderable Scene.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lidar_rt_tpu.config import Args, default_experiment  # noqa: E402
from lidar_rt_tpu.data import build, synthetic  # noqa: E402
from lidar_rt_tpu.utils import checkpoint as ckpt_lib  # noqa: E402
from lidar_rt_tpu.utils import import_torch  # noqa: E402


def _capture_tuple(rng, n, extent=42.0, active_deg=2):
    """A reference GaussianModel.capture() 12-tuple (gaussian_model.py:58)."""
    t = lambda *s: torch.tensor(rng.normal(size=s).astype(np.float32))
    return (
        active_deg,
        t(n, 3),            # _xyz
        t(n, 1, 3),         # _features_dc
        t(n, 15, 3),        # _features_rest
        t(n, 2),            # _scaling (log)
        t(n, 4),            # _rotation (raw wxyz)
        t(n, 1),            # _opacity (logit)
        torch.zeros(n),     # max_radii2D
        torch.zeros(n, 1),  # xyz_gradient_accum
        torch.zeros(n, 1),  # denom
        {"state": {}, "param_groups": []},   # optimizer state dict
        extent,             # spatial_lr_scale
    )


@pytest.fixture(scope="module")
def template():
    np.random.seed(0)
    frames, track = synthetic.generate(num_frames=2, height=8, width=64)
    d = default_experiment().to_dict()
    args = Args(d)
    return build.assemble_scene(frames, [track], args,
                                key=jax.random.key(0))


class TestAssetImport:
    def test_roundtrip_values(self, tmp_path):
        rng = np.random.default_rng(3)
        tup = _capture_tuple(rng, 100)
        asset = import_torch.asset_from_reference(tup, pad_multiple=128)
        assert asset.capacity == 128
        assert int(asset.num_alive) == 100
        np.testing.assert_array_equal(np.asarray(asset.xyz[:100]),
                                      tup[1].numpy())
        np.testing.assert_array_equal(np.asarray(asset.f_rest[:100]),
                                      tup[3].numpy())
        np.testing.assert_array_equal(np.asarray(asset.log_scale[:100]),
                                      tup[4].numpy())
        np.testing.assert_array_equal(np.asarray(asset.opacity_logit[:100]),
                                      tup[6].numpy().reshape(-1))
        assert int(asset.active_sh_degree) == 2
        assert asset.extent == 42.0
        # Dead padding is inert: opacity ~ 0, identity quats.
        assert float(asset.opacity[100:].max()) < 1e-6
        np.testing.assert_array_equal(np.asarray(asset.quat[100:, 0]), 1.0)

    def test_rejects_3d_scaling(self):
        rng = np.random.default_rng(0)
        tup = list(_capture_tuple(rng, 10))
        tup[4] = torch.zeros(10, 3)   # 3DGS-style scales
        with pytest.raises(ValueError, match="2D-surfel"):
            import_torch.asset_from_reference(tuple(tup))

    def test_headroom_rounds_capacity(self):
        rng = np.random.default_rng(0)
        tup = _capture_tuple(rng, 1000)
        asset = import_torch.asset_from_reference(tup, pad_multiple=1024,
                                                  headroom=1.5)
        assert asset.capacity == 2048   # ceil(1500 / 1024) * 1024


class TestSceneImport:
    def test_scene_from_reference_renders(self, template, tmp_path):
        rng = np.random.default_rng(7)
        n_actors = template.num_actors
        tuples = [_capture_tuple(rng, 200)] + \
            [_capture_tuple(rng, 40, extent=5.0) for _ in range(n_actors)]
        pth = tmp_path / "ckpt_it_30000_good.pth"
        torch.save((tuples, 30000), pth)

        scene, iteration = import_torch.scene_from_reference(
            str(pth), template)
        assert iteration == 30000
        assert int(scene.background.num_alive) == 200
        assert scene.num_actors == n_actors
        if n_actors:
            np.testing.assert_array_equal(
                np.asarray(scene.actors.xyz[0, :40]), tuples[1][1].numpy())
            # Tracks come from the template (the reference keeps them in
            # the dataset, not the checkpoint).
            assert scene.tracks is template.tracks

        # The imported scene composes + renders.
        from lidar_rt_tpu.core import rays as rays_lib
        from lidar_rt_tpu.ops import tracer
        from lidar_rt_tpu.scene.scene import compose
        bundle, _ = compose(scene, jnp.asarray(0))
        grid = rays_lib.SensorGrid.from_bounds(8, (-0.3, 0.1))
        out = tracer.trace(
            bundle, grid, 64, jnp.eye(4), jnp.array([0.0, 0.0, 1.0]),
            cfg=tracer.TraceConfig(engine="jax"))
        assert bool(jnp.all(jnp.isfinite(out.channels)))

    def test_asset_count_mismatch_raises(self, template, tmp_path):
        rng = np.random.default_rng(1)
        tuples = [_capture_tuple(rng, 10)] * (template.num_actors + 3)
        pth = tmp_path / "bad.pth"
        torch.save((tuples, 1), pth)
        with pytest.raises(ValueError, match="assets"):
            import_torch.scene_from_reference(str(pth), template)

    def test_npz_roundtrip_for_eval(self, template, tmp_path):
        """The converted Scene survives our checkpoint container — the
        handoff eval.py -m expects."""
        rng = np.random.default_rng(2)
        tuples = [_capture_tuple(rng, 50)] + \
            [_capture_tuple(rng, 20, extent=5.0)
             for _ in range(template.num_actors)]
        pth = tmp_path / "c.pth"
        torch.save((tuples, 777), pth)
        scene, it = import_torch.scene_from_reference(str(pth), template)
        out = tmp_path / "ckpt_it_777_good.npz"
        ckpt_lib.save(str(out), scene, {"iteration": it})
        loaded, meta = ckpt_lib.load(str(out))
        assert meta["iteration"] == 777
        assert not hasattr(loaded, "scene")   # bare Scene, eval's fallback
        np.testing.assert_array_equal(np.asarray(loaded.background.xyz),
                                      np.asarray(scene.background.xyz))
