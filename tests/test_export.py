"""Export utilities: PLY roundtrip, PNG validity, config system."""

import os
import zlib

import numpy as np
import pytest

from lidar_rt_tpu import config as config_lib
from lidar_rt_tpu.utils import export


class TestPly:
    def test_roundtrip_with_colors(self, tmp_path):
        pts = np.random.default_rng(0).normal(size=(100, 3)).astype(
            np.float32)
        col = np.random.default_rng(1).uniform(size=(100, 3)).astype(
            np.float32)
        p = str(tmp_path / "a.ply")
        export.write_ply(p, pts, col)
        pts2, col2 = export.read_ply(p)
        np.testing.assert_allclose(pts2, pts)
        np.testing.assert_allclose(col2, col, atol=1 / 255 + 1e-6)

    def test_roundtrip_plain(self, tmp_path):
        pts = np.zeros((5, 3), np.float32)
        p = str(tmp_path / "b.ply")
        export.write_ply(p, pts)
        pts2, col2 = export.read_ply(p)
        assert col2 is None and pts2.shape == (5, 3)


class TestPng:
    def test_valid_png_structure(self, tmp_path):
        img = np.random.default_rng(2).uniform(size=(16, 24))
        p = str(tmp_path / "x.png")
        export.write_png(p, img)
        raw = open(p, "rb").read()
        assert raw[:8] == b"\x89PNG\r\n\x1a\n"
        assert b"IHDR" in raw and b"IDAT" in raw and b"IEND" in raw
        # decompress scanlines: 16 rows * (1 + 24*3) bytes
        idat_start = raw.index(b"IDAT") + 4
        import struct
        ln = struct.unpack(">I", raw[raw.index(b"IDAT") - 4:
                                     raw.index(b"IDAT")])[0]
        data = zlib.decompress(raw[idat_start:idat_start + ln])
        assert len(data) == 16 * (1 + 24 * 3)

    def test_colormap_range(self):
        c = export.colormap(np.linspace(0, 1, 100))
        assert c.shape == (100, 3)
        assert c.min() >= 0 and c.max() <= 1


class TestConfig:
    def test_parent_chain_and_override(self, tmp_path):
        base = tmp_path / "base.yaml"
        base.write_text("a: 1\nnested: {x: 1, y: 2}\n")
        child = tmp_path / "child.yaml"
        child.write_text(
            f"parent_config: {base}\na: 3\nnested: {{y: 5}}\nz: 9\n")
        args = config_lib.parse(str(child))
        assert args.a == 3
        assert args.nested.x == 1
        assert args.nested.y == 5
        assert args.z == 9

    def test_cycle_detection(self, tmp_path):
        a = tmp_path / "a.yaml"
        b = tmp_path / "b.yaml"
        a.write_text(f"parent_config: {b}\n")
        b.write_text(f"parent_config: {a}\n")
        with pytest.raises(ValueError, match="cycle"):
            config_lib.parse(str(a))

    def test_repo_configs_parse(self):
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        args = config_lib.parse(
            os.path.join(root, "configs/synthetic/dynamic.yaml"),
            config_lib.parse(os.path.join(root, "configs/exp.yaml")))
        assert args.opt.iterations == 30_000
        assert args.dataset == "synthetic"
        assert args.tracer.tile_w == 128

    def test_missing_key_error_names_available(self):
        args = config_lib.Args({"a": 1})
        with pytest.raises(AttributeError, match="available"):
            _ = args.missing


class TestSplatPly:
    def test_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from lidar_rt_tpu.scene import from_points
        asset = from_points(
            jnp.asarray(np.random.default_rng(0).normal(size=(20, 3)),
                        jnp.float32),
            jnp.full((20, 3), 0.5), jax.random.key(0), 32)
        p = str(tmp_path / "splats.ply")
        export.write_splat_ply(p, asset)
        back = export.read_splat_ply(p)
        assert len(back["x"]) == 20
        np.testing.assert_allclose(back["x"], np.asarray(asset.xyz[:20, 0]))
        np.testing.assert_allclose(back["opacity"],
                                   np.asarray(asset.opacity_logit[:20]),
                                   rtol=1e-6)
        assert "f_rest_44" in back["__fields__"]
        assert "scale_1" in back["__fields__"]


class TestApng:
    def test_structure(self, tmp_path):
        frames = [np.full((8, 12), v, np.float32) for v in (0.1, 0.5, 0.9)]
        p = str(tmp_path / "anim.png")
        export.write_apng(p, frames, fps=5)
        raw = open(p, "rb").read()
        assert raw[:8] == b"\x89PNG\r\n\x1a\n"
        assert raw.count(b"fcTL") == 3
        assert raw.count(b"fdAT") == 2
        assert b"acTL" in raw and b"IEND" in raw


class TestConsole:
    """Colored console layer (reference console_utils.py:305-373)."""

    def test_colors_disabled_when_piped(self, capsys, monkeypatch):
        monkeypatch.delenv("FORCE_COLOR", raising=False)
        from lidar_rt_tpu.utils import console
        # pytest's captured stdout is not a tty -> plain text
        assert console.red("x") == "x"
        console.log("hello", level="warn")
        out = capsys.readouterr().out
        assert "hello" in out and "warn" in out and "\x1b[" not in out

    def test_colors_enabled_when_forced(self, monkeypatch):
        monkeypatch.setenv("FORCE_COLOR", "1")
        monkeypatch.delenv("NO_COLOR", raising=False)
        from lidar_rt_tpu.utils import console
        assert console.green("ok").startswith("\x1b[32m")
        assert console.bold("b").startswith("\x1b[1m")

    def test_no_color_wins(self, monkeypatch):
        monkeypatch.setenv("NO_COLOR", "1")
        monkeypatch.setenv("FORCE_COLOR", "1")
        from lidar_rt_tpu.utils import console
        assert console.red("x") == "x"
