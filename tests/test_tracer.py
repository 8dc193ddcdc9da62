"""Tiled tracer vs the dense oracle: binning, forward parity, gradients."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_rt_tpu.core import rays as rays_lib
from lidar_rt_tpu.ops import binning, composite, geometry, tracer


def _random_bundle(n=80, seed=0, spread=8.0, center=(12.0, 0.0, 0.0),
                   opacity_range=(0.3, 0.95)):
    rng = np.random.default_rng(seed)
    means = rng.normal(scale=spread / 3, size=(n, 3)) + np.asarray(center)
    quats = rng.normal(size=(n, 4))
    scales = rng.uniform(0.2, 0.6, size=(n, 2))
    opac = rng.uniform(*opacity_range, size=(n,))
    sh = np.zeros((n, 16, 3), np.float32)
    sh[:, 0, :] = rng.uniform(-0.5, 1.0, size=(n, 3))
    sh[:, 1:4, :] = rng.normal(scale=0.1, size=(n, 3, 3))
    return composite.SurfelBundle(
        means=jnp.asarray(means, jnp.float32),
        rotations=jnp.asarray(quats, jnp.float32),
        scales=jnp.asarray(scales, jnp.float32),
        opacities=jnp.asarray(opac, jnp.float32),
        sh=jnp.asarray(sh, jnp.float32))


GRID = rays_lib.SensorGrid.from_bounds(32, (-0.3, 0.1))
WIDTH = 256
S2W = jnp.eye(4)
BG = jnp.array([0.0, 0.0, 1.0])


def _oracle(bundle, active_deg=3):
    origin, dirs = rays_lib.range_rays(GRID, WIDTH, S2W)
    out = composite.render_dense(bundle, origin, dirs.reshape(-1, 3), BG,
                                 active_deg)
    return out.channels.reshape(GRID.height, WIDTH, 9), out.accum_weights


class TestBinning:
    def test_center_lands_in_right_tile(self):
        # A splat straight ahead (azimuth 0) at the middle inclination.
        bundle = _random_bundle(1)
        means = jnp.array([[10.0, 0.0, -1.0]])
        cfg = binning.TileConfig(tile_h=8, tile_w=64, max_per_tile=4)
        asn = binning.bin_surfels(GRID, WIDTH, jnp.eye(4), means,
                                  jnp.full((1, 2), 0.3), jnp.full((1,), 0.9),
                                  cfg)
        r, c, _ = rays_lib.project_points(GRID, means, jnp.eye(4), WIDTH)
        ty, tx = int(r[0]) // 8, int(c[0]) // 64
        t = ty * 4 + tx
        assert bool(asn.valid[t, 0])
        assert int(asn.index[t, 0]) == 0

    def test_azimuth_seam_wrap(self):
        # A splat behind the sensor (azimuth ~ pi boundary = column seam).
        means = jnp.array([[-10.0, 0.01, -1.0]])
        cfg = binning.TileConfig(tile_h=32, tile_w=64, max_per_tile=4)
        asn = binning.bin_surfels(GRID, WIDTH, jnp.eye(4), means,
                                  jnp.full((1, 2), 1.5), jnp.full((1,), 0.9),
                                  cfg)
        hit_tiles = np.where(np.asarray(asn.valid[:, 0]))[0]
        # footprint near the seam: both the first and last column tile see it
        assert 0 in hit_tiles and 3 in hit_tiles

    def test_nearest_first_and_truncation(self):
        means = jnp.array([[5.0, 0.0, -0.5], [20.0, 0.0, -2.0],
                           [10.0, 0.0, -1.0]])
        cfg = binning.TileConfig(tile_h=32, tile_w=256, max_per_tile=2)
        asn = binning.bin_surfels(GRID, WIDTH, jnp.eye(4), means,
                                  jnp.full((3, 2), 0.5), jnp.full((3,), 0.9),
                                  cfg)
        assert list(np.asarray(asn.index[0, :2])) == [0, 2]  # 5 m, then 10 m
        assert int(asn.truncated[0]) == 1

    def test_transparent_surfels_skipped(self):
        means = jnp.array([[10.0, 0.0, -1.0]])
        cfg = binning.TileConfig(tile_h=32, tile_w=256, max_per_tile=4)
        asn = binning.bin_surfels(GRID, WIDTH, jnp.eye(4), means,
                                  jnp.full((1, 2), 0.5),
                                  jnp.full((1,), 1e-4), cfg)
        assert not bool(asn.valid.any())

    def test_sample_snap_culls_between_rows(self):
        """A splat whose sub-pixel row footprint sits strictly between two
        integer beam rows touches no ray sample: sample_snap drops it, and
        with the cull off it is listed but renders to exactly background
        (the cull is output-exact by construction)."""
        # GRID is from_bounds(32, (-0.3, 0.1)): row r (fractional) sits at
        # inclination ((32 - r)/32) * 0.4 - 0.3.  Target a half-integer row.
        frac_row = 10.5
        incl = ((32 - frac_row) / 32) * 0.4 - 0.3
        d = 30.0
        means = jnp.array([[d * np.cos(incl), 0.0, d * np.sin(incl)]])
        # Flat disk seen nearly edge-on in elevation: identity quat ->
        # normal +z, tiny angular row extent at 30 m.
        scales = jnp.array([[0.12, 0.12]])
        opac = jnp.full((1,), 0.9)
        cfg = binning.TileConfig(tile_h=8, tile_w=64, max_per_tile=4,
                                 sample_snap=False, int_overlap=False)
        rot = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        asn_off = binning.bin_surfels(GRID, WIDTH, jnp.eye(4), means,
                                      scales, opac, cfg, rotations=rot)
        asn_on = binning.bin_surfels(
            GRID, WIDTH, jnp.eye(4), means, scales, opac,
            dataclasses.replace(cfg, sample_snap=True), rotations=rot)
        # The per-tile integer-sample overlap test culls it too (without
        # the full-raster snap).
        asn_int = binning.bin_surfels(
            GRID, WIDTH, jnp.eye(4), means, scales, opac,
            dataclasses.replace(cfg, int_overlap=True), rotations=rot)
        assert not bool(asn_int.valid.any())
        assert bool(asn_off.valid.any())      # continuous footprint overlaps
        assert not bool(asn_on.valid.any())   # no integer sample inside
        # Output exactness: the uncaulled render equals pure background.
        bundle = composite.SurfelBundle(
            means=means, rotations=rot, scales=scales, opacities=opac,
            sh=jnp.zeros((1, 16, 3)))
        cfg_t = tracer.TraceConfig(tile=cfg, engine="jax")
        out = tracer.trace(bundle, GRID, WIDTH, S2W, BG, cfg=cfg_t)
        empty = tracer.trace(
            composite.SurfelBundle(
                means=means, rotations=rot, scales=scales,
                opacities=jnp.zeros((1,)), sh=jnp.zeros((1, 16, 3))),
            GRID, WIDTH, S2W, BG, cfg=cfg_t)
        np.testing.assert_allclose(np.asarray(out.channels),
                                   np.asarray(empty.channels), atol=1e-6)

    def test_snap_pad_margin(self):
        """snap_pad_px widens the existence test independently of pad_px:
        at snap_pad 0.5 a footprint within 0.5 px of an integer row
        survives the cull."""
        frac_row = 10.6   # 0.4 px from row 11 -> inside the 0.5 margin
        incl = ((32 - frac_row) / 32) * 0.4 - 0.3
        d = 30.0
        means = jnp.array([[d * np.cos(incl), 0.0, d * np.sin(incl)]])
        scales = jnp.array([[0.12, 0.12]])
        opac = jnp.full((1,), 0.9)
        rot = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        base = binning.TileConfig(tile_h=8, tile_w=64, max_per_tile=4,
                                  pad_px=2.0, snap_pad_px=0.0)
        tight = binning.bin_surfels(GRID, WIDTH, jnp.eye(4), means, scales,
                                    opac, base, rotations=rot)
        loose = binning.bin_surfels(
            GRID, WIDTH, jnp.eye(4), means, scales, opac,
            dataclasses.replace(base, snap_pad_px=0.5), rotations=rot)
        vacuous = binning.bin_surfels(
            GRID, WIDTH, jnp.eye(4), means, scales, opac,
            dataclasses.replace(base, snap_pad_px=None), rotations=rot)
        assert not bool(tight.valid.any())
        assert bool(loose.valid.any())
        assert bool(vacuous.valid.any())      # pad_px=2 margin is vacuous

    def test_int_overlap_culls_tile_grazing(self):
        """A splat whose row footprint grazes a tile band without
        containing any of that tile's integer rows is listed under the
        continuous +-0.5 test but dropped by the integer-sample test —
        while staying listed in its home tile (output-exact: rays only
        exist at integer rows)."""
        # GRID rows: tile row-band 0 = rows 0..7, band 1 = rows 8..15.
        # Target a footprint row interval ~[6.95, 7.61]: it contains
        # integer row 7 (band 0) and crosses the continuous test's
        # band-1 edge at 7.5, but contains no integer row of band 1.
        frac_row, half_rows = 7.28, 0.33
        incl = ((32 - frac_row) / 32) * 0.4 - 0.3
        d = 30.0
        # Disk FACING the sensor (normal along view: quat = roty(90deg))
        # so the row extent is scale-0 directly; rows/radian = 32 / 0.4.
        cut = float(np.sqrt(2 * np.log(255 * 0.9))) + 0.01
        s_row = half_rows * (0.4 / 32) * d / cut
        means = jnp.array([[d * np.cos(incl), 0.0, d * np.sin(incl)]])
        scales = jnp.array([[s_row, 0.15]])
        opac = jnp.full((1,), 0.9)
        c45 = float(np.cos(np.pi / 4))
        rot = jnp.array([[c45, 0.0, c45, 0.0]])
        base = binning.TileConfig(tile_h=8, tile_w=64, max_per_tile=4,
                                  sample_snap=False, int_overlap=False)
        cont = binning.bin_surfels(GRID, WIDTH, jnp.eye(4), means, scales,
                                   opac, base, rotations=rot)
        inte = binning.bin_surfels(
            GRID, WIDTH, jnp.eye(4), means, scales, opac,
            dataclasses.replace(base, int_overlap=True), rotations=rot)
        cont_tiles = set(np.where(np.asarray(cont.valid.any(axis=1)))[0]
                         // 4)   # tile row index (4 col tiles per row)
        int_tiles = set(np.where(np.asarray(inte.valid.any(axis=1)))[0]
                        // 4)
        # Continuous test lists both row-tile bands; the integer test
        # keeps only the band that contains an actual ray sample (row 7
        # is in band 0).
        assert cont_tiles == {0, 1}
        assert int_tiles == {0}

    def test_int_overlap_binner_parity(self):
        """All three binners implement the same integer-sample overlap
        test: identical candidate sets on a random scene."""
        bundle = _random_bundle(60, seed=3)
        cfg = binning.TileConfig(tile_h=8, tile_w=64, max_per_tile=60)
        sets = []
        for b in ("topk", "hier", "sort"):
            c = dataclasses.replace(cfg, binner=b, dup_rows=4, dup_cols=4)
            asn = binning.bin_surfels(GRID, WIDTH, jnp.eye(4),
                                      bundle.means, bundle.scales,
                                      bundle.opacities, c,
                                      rotations=bundle.rotations)
            idx = np.asarray(asn.index)
            ok = np.asarray(asn.valid)
            sets.append([frozenset(idx[t][ok[t]]) for t in
                         range(idx.shape[0])])
        assert sets[0] == sets[1] == sets[2]


class TestTracerForwardParity:
    @pytest.mark.parametrize("exact_order", [True, False])
    def test_matches_oracle(self, exact_order):
        bundle = _random_bundle(80)
        cfg = tracer.TraceConfig(
            tile=binning.TileConfig(tile_h=8, tile_w=64, max_per_tile=80),
            exact_order=exact_order, tile_batch=4)
        out = tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, cfg)
        ref_ch, ref_acc = _oracle(bundle)
        err = np.abs(np.asarray(out.channels) - np.asarray(ref_ch))
        if exact_order:
            assert err.max() < 1e-4
        else:
            # tile-order approximation: tiny fraction of pixels where two
            # surfels interleave differently per ray
            assert (err > 5e-2).mean() < 1e-3
            assert np.median(err) < 1e-4
        if exact_order:
            np.testing.assert_allclose(np.asarray(out.accum_weights),
                                       np.asarray(ref_acc), atol=1e-4)

    def test_k_truncation_error_shrinks_with_k(self):
        # The K-candidate cap replaces the reference's unbounded chunked
        # re-trace loop (forward.cu:282-291).  The contract: error decreases
        # monotonically in K and vanishes once K covers every candidate.
        bundle = _random_bundle(120, seed=3, opacity_range=(0.7, 0.99))

        def run(k):
            cfg = tracer.TraceConfig(
                tile=binning.TileConfig(tile_h=8, tile_w=64, max_per_tile=k))
            return tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, cfg)

        full = run(120)
        d_full = np.asarray(full.channels[..., 3])
        mask = np.asarray(full.channels[..., 4]) > 0.5

        def mean_err(k):
            d = np.asarray(run(k).channels[..., 3])
            return np.abs(d - d_full)[mask].mean()

        e16, e48, e96 = mean_err(16), mean_err(48), mean_err(96)
        assert e16 > e48 > e96
        assert e96 < 0.05
        assert mean_err(120) == 0.0

    def test_nondivisible_raster(self):
        grid = rays_lib.SensorGrid.from_bounds(66, (-0.3, 0.1))
        bundle = _random_bundle(40, seed=5)
        cfg = tracer.TraceConfig(
            tile=binning.TileConfig(tile_h=32, tile_w=128, max_per_tile=40),
            exact_order=True)  # dense-oracle comparison needs depth order
        out = tracer.trace(bundle, grid, 1030, S2W, BG, 3, cfg)
        assert out.channels.shape == (66, 1030, 9)
        origin, dirs = rays_lib.range_rays(grid, 1030, S2W)
        ref = composite.render_dense(bundle, origin, dirs.reshape(-1, 3), BG,
                                     3).channels.reshape(66, 1030, 9)
        np.testing.assert_allclose(np.asarray(out.channels), np.asarray(ref),
                                   atol=1e-4)

    def test_empty_scene_is_background(self):
        bundle = _random_bundle(4)
        bundle = bundle._replace(opacities=jnp.zeros((4,)))
        out = tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3)
        np.testing.assert_allclose(np.asarray(out.channels[..., 0:3]),
                                   np.broadcast_to(np.array([0, 0, 1.0]),
                                                   (32, 256, 3)), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.channels[..., 8]), 1.0)


class TestTracerGradients:
    def _loss(self, trace_fn):
        def loss(bundle):
            out = trace_fn(bundle)
            ch = out.channels if hasattr(out, "channels") else out
            return (jnp.sum(ch[..., 3] ** 2) * 1e-3
                    + jnp.sum(ch[..., 0:3] ** 2)
                    + jnp.sum(ch[..., 8]))
        return loss

    def test_grads_match_oracle(self):
        bundle = _random_bundle(40, seed=7)
        cfg = tracer.TraceConfig(
            tile=binning.TileConfig(tile_h=8, tile_w=64, max_per_tile=40),
            tile_batch=4,
            exact_order=True)  # dense-oracle gradients need depth order

        def run_tiled(b):
            return tracer.trace(b, GRID, WIDTH, S2W, BG, 3, cfg)

        def run_oracle(b):
            origin, dirs = rays_lib.range_rays(GRID, WIDTH, S2W)
            out = composite.render_dense(b, origin, dirs.reshape(-1, 3), BG, 3)
            return out.channels.reshape(GRID.height, WIDTH, 9)

        g_tiled = jax.grad(self._loss(run_tiled))(bundle)
        g_oracle = jax.grad(self._loss(run_oracle))(bundle)
        for name in ("means", "scales", "opacities", "sh", "rotations"):
            a = np.asarray(getattr(g_tiled, name))
            b = np.asarray(getattr(g_oracle, name))
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-3,
                                       err_msg=name)

    def test_render_frame_outputs(self):
        bundle = _random_bundle(40, seed=8)
        out = tracer.render_frame(bundle, GRID, WIDTH, S2W, 3)
        assert out["depth"].shape == (32, 256)
        assert out["raydrop"].shape == (32, 256)
        rd = np.asarray(out["raydrop"])
        assert (rd >= 0).all() and (rd <= 1).all()
        # empty rays: bg logits (0 hit, 1 drop) -> drop prob ~ sigmoid-ish
        empty = np.asarray(out["channels"][..., 4]) < 1e-6
        assert rd[empty].min() > 0.5


class TestMultiReturn:
    def test_second_return_sees_behind_first_surface(self):
        # two opaque walls at x=10 and x=20 straight ahead
        n = 40
        ys = np.linspace(-2, 2, 20)
        means = np.concatenate([
            np.stack([np.full(20, 10.0), ys, np.zeros(20)], 1),
            np.stack([np.full(20, 20.0), ys, np.zeros(20)], 1)]).astype(
            np.float32)
        quats = np.tile(np.array([0.7071068, 0, 0.7071068, 0], np.float32),
                        (n, 1))
        sh = np.zeros((n, 16, 3), np.float32)
        sh[:, 0] = 0.8
        bundle = composite.SurfelBundle(
            means=jnp.asarray(means), rotations=jnp.asarray(quats),
            scales=jnp.full((n, 2), 0.8), opacities=jnp.full((n,), 0.99),
            sh=jnp.asarray(sh))
        cfg = tracer.TraceConfig(
            tile=binning.TileConfig(tile_h=8, tile_w=64, max_per_tile=40),
            engine="jax")
        grid8 = rays_lib.SensorGrid.from_bounds(8, (-0.02, 0.02))
        r1, r2 = tracer.render_multi_return(
            bundle, grid8, 256, jnp.eye(4), 0, cfg, return_gap=2.0)
        d1 = np.asarray(r1["depth"])
        d2 = np.asarray(r2["depth"])
        # center ray: first return ~10, second ~20
        assert abs(d1[4, 128] - 10.0) < 0.5
        assert abs(d2[4, 128] - 20.0) < 0.5

    def test_min_depth_threshold_exact(self):
        bundle = _random_bundle(40, seed=9)
        cfg = tracer.TraceConfig(
            tile=binning.TileConfig(tile_h=8, tile_w=64, max_per_tile=40),
            engine="jax")
        md = jnp.full((GRID.height, WIDTH), 15.0)
        out = tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, cfg,
                           min_depth=md)
        # every composited hit is beyond 15 m: expected depth over accum
        d = np.asarray(out.channels[..., 3])
        acc = np.asarray(out.channels[..., 4])
        sel = acc > 0.1
        assert (d[sel] / acc[sel] >= 15.0 - 1e-3).all()


class TestSortBinner:
    @pytest.mark.parametrize("seed,tile", [(0, (8, 64, 80)),
                                           (3, (16, 128, 120)),
                                           (5, (32, 64, 80))])
    def test_matches_topk_binner(self, seed, tile):
        bundle = _random_bundle(80, seed=seed)
        th, tw, k = tile
        base = dict(tile_h=th, tile_w=tw, max_per_tile=k)
        topk = binning.bin_surfels(GRID, WIDTH, jnp.eye(4), bundle.means,
                                   bundle.scales, bundle.opacities,
                                   binning.TileConfig(**base, binner="topk"))
        srt = binning.bin_surfels(GRID, WIDTH, jnp.eye(4), bundle.means,
                                  bundle.scales, bundle.opacities,
                                  binning.TileConfig(**base, binner="sort",
                                                     dup_rows=8,
                                                     dup_cols=8))
        for t in range(topk.index.shape[0]):
            a = set(np.asarray(topk.index[t])[np.asarray(topk.valid[t])]
                    .tolist())
            b = set(np.asarray(srt.index[t])[np.asarray(srt.valid[t])]
                    .tolist())
            assert a == b, f"tile {t}: topk-only {a-b}, sort-only {b-a}"
        # nearest-first ordering matches too (distinct ranges)
        np.testing.assert_array_equal(
            np.asarray(topk.index)[np.asarray(topk.valid)],
            np.asarray(srt.index)[np.asarray(srt.valid)])

    def test_seam_coverage(self):
        # footprint across the azimuth seam must land in first + last tiles
        means = jnp.array([[-10.0, 0.01, -1.0]])
        cfg = binning.TileConfig(tile_h=32, tile_w=64, max_per_tile=4,
                                 binner="sort", dup_cols=4)
        asn = binning.bin_surfels(GRID, WIDTH, jnp.eye(4), means,
                                  jnp.full((1, 2), 1.5), jnp.full((1,), 0.9),
                                  cfg)
        hit_tiles = np.where(np.asarray(asn.valid[:, 0]))[0]
        assert 0 in hit_tiles and 3 in hit_tiles

    def test_render_parity_between_binners(self):
        bundle = _random_bundle(60, seed=7)
        base = dict(tile_h=8, tile_w=64, max_per_tile=64)
        out_t = tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3,
                             tracer.TraceConfig(
                                 tile=binning.TileConfig(**base),
                                 engine="jax"))
        out_s = tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3,
                             tracer.TraceConfig(
                                 tile=binning.TileConfig(
                                     **base, binner="sort", dup_rows=6,
                                     dup_cols=8), engine="jax"))
        np.testing.assert_allclose(np.asarray(out_s.channels),
                                   np.asarray(out_t.channels), atol=1e-5)


class TestHierBinner:
    @pytest.mark.parametrize("seed,tile", [(0, (8, 64, 80)),
                                           (5, (16, 128, 80))])
    def test_matches_topk_binner(self, seed, tile):
        bundle = _random_bundle(80, seed=seed)
        th, tw, k = tile
        base = dict(tile_h=th, tile_w=tw, max_per_tile=k)
        topk = binning.bin_surfels(GRID, WIDTH, jnp.eye(4), bundle.means,
                                   bundle.scales, bundle.opacities,
                                   binning.TileConfig(**base, binner="topk"),
                                   rotations=bundle.rotations)
        hier = binning.bin_surfels(GRID, WIDTH, jnp.eye(4), bundle.means,
                                   bundle.scales, bundle.opacities,
                                   binning.TileConfig(**base, binner="hier",
                                                      coarse_factor=1),
                                   rotations=bundle.rotations)
        # coarse_factor=1 with K >= N makes both exact: sets AND order match
        np.testing.assert_array_equal(
            np.asarray(topk.index)[np.asarray(topk.valid)],
            np.asarray(hier.index)[np.asarray(hier.valid)])

    def test_truncation_counted(self):
        bundle = _random_bundle(80, seed=1)
        cfg = binning.TileConfig(tile_h=8, tile_w=64, max_per_tile=8,
                                 binner="hier", coarse_factor=2)
        asn = binning.bin_surfels(GRID, WIDTH, jnp.eye(4), bundle.means,
                                  bundle.scales, bundle.opacities, cfg,
                                  rotations=bundle.rotations)
        assert int(np.asarray(asn.truncated).sum()) > 0
        assert np.asarray(asn.valid.sum(1)).max() <= 8

    @pytest.mark.parametrize("seed", [0, 4])
    def test_macro_level_matches_two_level(self, seed):
        """With an unsaturated macro budget the 3-level selection equals
        the 2-level hier binner exactly (the macro margin telescopes, so
        any fine-sector overlap is inside its parent macro sector).

        Surfels sit on an azimuth ring so each macro sector holds ~n/2
        candidates: the macro level is ACTIVE (K_a < n) but unsaturated
        (K_a > per-macro overlap)."""
        rng = np.random.default_rng(seed)
        n = 120
        ang = rng.uniform(-np.pi, np.pi, n)
        rad = rng.uniform(8.0, 15.0, n)
        bundle = _random_bundle(n, seed=seed)._replace(
            means=jnp.asarray(np.stack(
                [rad * np.cos(ang), rad * np.sin(ang),
                 rng.uniform(-1, 1, n)], -1), jnp.float32))
        base = dict(tile_h=8, tile_w=64, max_per_tile=16, binner="hier",
                    coarse_factor=2)
        two = binning.bin_surfels(GRID, WIDTH, jnp.eye(4), bundle.means,
                                  bundle.scales, bundle.opacities,
                                  binning.TileConfig(**base),
                                  rotations=bundle.rotations)
        # K_a = 3 * 32 = 96 < n = 120 (macro level active)
        three = binning.bin_surfels(GRID, WIDTH, jnp.eye(4), bundle.means,
                                    bundle.scales, bundle.opacities,
                                    binning.TileConfig(**base,
                                                       macro_cols=128,
                                                       macro_factor=3),
                                    rotations=bundle.rotations)
        assert int(np.asarray(three.truncated).sum()) \
            == int(np.asarray(two.truncated).sum())  # no macro truncation
        np.testing.assert_array_equal(np.asarray(two.valid),
                                      np.asarray(three.valid))
        np.testing.assert_array_equal(
            np.asarray(two.index)[np.asarray(two.valid)],
            np.asarray(three.index)[np.asarray(three.valid)])

    def test_macro_truncation_counted(self):
        bundle = _random_bundle(120, seed=2)
        cfg = binning.TileConfig(tile_h=8, tile_w=64, max_per_tile=8,
                                 binner="hier", coarse_factor=2,
                                 macro_cols=128, macro_factor=1)
        asn = binning.bin_surfels(GRID, WIDTH, jnp.eye(4), bundle.means,
                                  bundle.scales, bundle.opacities, cfg,
                                  rotations=bundle.rotations)
        assert int(np.asarray(asn.truncated).sum()) > 0
        assert np.asarray(asn.valid.sum(1)).max() <= 8


class TestRaydropHeads:
    def test_sigmoid_vs_softmax_head(self):
        bundle = _random_bundle(30, seed=13)
        cfg = tracer.TraceConfig(
            tile=binning.TileConfig(tile_h=8, tile_w=64, max_per_tile=32),
            engine="jax")
        soft = tracer.render_frame(bundle, GRID, WIDTH, S2W, 3, cfg,
                                   use_rayhit=True)
        sig = tracer.render_frame(bundle, GRID, WIDTH, S2W, 3, cfg,
                                  use_rayhit=False)
        # same underlying channels, different drop heads
        np.testing.assert_allclose(np.asarray(soft["depth"]),
                                   np.asarray(sig["depth"]))
        logits = np.asarray(soft["channels"][..., 1:3])
        expect_soft = np.exp(logits[..., 1]) / (
            np.exp(logits[..., 0]) + np.exp(logits[..., 1]))
        np.testing.assert_allclose(np.asarray(soft["raydrop"]), expect_soft,
                                   atol=1e-5)
        expect_sig = 1.0 / (1.0 + np.exp(-logits[..., 1]))
        np.testing.assert_allclose(np.asarray(sig["raydrop"]), expect_sig,
                                   atol=1e-5)


class TestTailRetrace:
    """Unbounded-hit tail (cfg.tail_passes): the re-binned continuation of
    compositing past each tile's K budget — reference forward.cu:282-291."""

    # Dense cluster so a small K truncates hard.
    _bundle = staticmethod(lambda seed=0: _random_bundle(
        140, seed=seed, spread=4.0, opacity_range=(0.2, 0.6)))

    def _cfgs(self, k, tail, engine="jax", binner="topk"):
        tile = binning.TileConfig(tile_h=32, tile_w=128, max_per_tile=k,
                                  binner=binner)
        return tracer.TraceConfig(tile=tile, engine=engine,
                                  exact_order=False, tail_passes=tail)

    def test_tail_equals_doubled_budget(self):
        """K=32 + one tail pass composites exactly ranks 1..64: identical
        to a single K=64 pass under tile-order semantics."""
        b = self._bundle()
        o_tail = tracer.trace(b, GRID, WIDTH, S2W, BG, 3,
                              self._cfgs(32, tail=1))
        o_big = tracer.trace(b, GRID, WIDTH, S2W, BG, 3,
                             self._cfgs(64, tail=0))
        np.testing.assert_allclose(np.asarray(o_tail.channels),
                                   np.asarray(o_big.channels), atol=1e-5)
        np.testing.assert_allclose(np.asarray(o_tail.accum_weights),
                                   np.asarray(o_big.accum_weights),
                                   atol=1e-5)

    def test_tail_improves_truncated_render(self):
        """With heavy truncation, a tail pass must move the render toward
        the untruncated reference."""
        b = self._bundle(seed=4)
        ref = tracer.trace(b, GRID, WIDTH, S2W, BG, 3,
                           self._cfgs(140, tail=0))
        base = tracer.trace(b, GRID, WIDTH, S2W, BG, 3,
                            self._cfgs(32, tail=0))
        tail = tracer.trace(b, GRID, WIDTH, S2W, BG, 3,
                            self._cfgs(32, tail=2))
        err_base = float(jnp.mean(jnp.abs(
            base.channels[..., 3] - ref.channels[..., 3])))
        err_tail = float(jnp.mean(jnp.abs(
            tail.channels[..., 3] - ref.channels[..., 3])))
        assert err_base > 1e-3          # K=32 actually truncates
        assert err_tail < 0.2 * err_base

    def test_tail_pallas_matches_jax(self):
        """The pallas engine's tail path (t0 kernel input + dL/dt0 VJP)
        must match the jax engine, values and gradients.

        Gradient tolerance is relative-L2 + cosine, not elementwise: the
        pallas backward uses the reference's suffix identity
        suffix_i = GW_total - prefix_{<=i} (backward.cu:584-604), whose
        floating-point cancellation for late candidates injects smooth
        O(1e-3 rel-L2) noise versus the jax engine's direct autodiff
        suffix sums on dense low-opacity scenes.  Measured round 5: the
        worst-element set is 100% stable under 1e-5 input perturbations
        (systematic float noise, not borderline gate flips), relL2
        ~1.7e-3, and the SAME spread exists with tail=0 — it is the
        k-buffer backward algorithm's numerics (shared with the CUDA
        reference), not a tail-path defect."""
        b = self._bundle(seed=2)

        def loss(bundle, engine):
            cfg = self._cfgs(128, tail=1, engine=engine)
            out = tracer.trace(bundle, GRID, WIDTH, S2W, BG, 3, cfg)
            return jnp.sum(out.channels[..., 0:4] ** 2), out.channels

        (l_p, ch_p), g_p = jax.value_and_grad(loss, has_aux=True)(
            b, "pallas")
        (l_j, ch_j), g_j = jax.value_and_grad(loss, has_aux=True)(b, "jax")
        np.testing.assert_allclose(np.asarray(ch_p), np.asarray(ch_j),
                                   atol=2e-4)
        gp = np.concatenate([np.ravel(x) for x in jax.tree.leaves(g_p)])
        gj = np.concatenate([np.ravel(x) for x in jax.tree.leaves(g_j)])
        cos = float(np.dot(gp, gj)
                    / max(np.linalg.norm(gp) * np.linalg.norm(gj), 1e-12))
        assert cos > 0.9999
        rel_l2 = float(np.linalg.norm(gp - gj)
                       / max(np.linalg.norm(gj), 1e-12))
        assert rel_l2 < 5e-3, rel_l2
        # dL/dt0 itself (the tail-specific term) has no suffix
        # cancellation: check it tightly via the t0-bearing channels.
        np.testing.assert_allclose(np.asarray(ch_p[..., 8]),
                                   np.asarray(ch_j[..., 8]), atol=2e-5)

    def test_tail_hier_binner_matches_topk(self):
        """The hier (and macro-level hier) binners' min_range filtering
        must reproduce the flat topk binner's tail selection (hier is
        exact while sector overlap fits the coarse budget)."""
        b = self._bundle(seed=7)
        ref = tracer.trace(b, GRID, WIDTH, S2W, BG, 3,
                           self._cfgs(32, tail=2, binner="topk"))
        for binner, extra in (("hier", {}),
                              ("hier", {"macro_cols": 256,
                                        "macro_factor": 2})):
            tile = binning.TileConfig(tile_h=32, tile_w=128,
                                      max_per_tile=32, binner=binner,
                                      coarse_factor=8, **extra)
            cfg = tracer.TraceConfig(tile=tile, engine="jax",
                                     exact_order=False, tail_passes=2)
            out = tracer.trace(b, GRID, WIDTH, S2W, BG, 3, cfg)
            np.testing.assert_allclose(np.asarray(out.channels),
                                       np.asarray(ref.channels), atol=1e-5,
                                       err_msg=f"binner={binner} {extra}")

    def test_tail_sort_binner_matches_topk(self):
        """The sort binner's per-duplicate min_range gate must reproduce
        the topk tail selection (caps sized to cover the scene)."""
        b = self._bundle(seed=9)
        ref = tracer.trace(b, GRID, WIDTH, S2W, BG, 3,
                           self._cfgs(32, tail=1, binner="topk"))
        tile = binning.TileConfig(tile_h=32, tile_w=128, max_per_tile=32,
                                  binner="sort", dup_rows=2, dup_cols=8)
        cfg = tracer.TraceConfig(tile=tile, engine="jax",
                                 exact_order=False, tail_passes=1)
        out = tracer.trace(b, GRID, WIDTH, S2W, BG, 3, cfg)
        np.testing.assert_allclose(np.asarray(out.channels),
                                   np.asarray(ref.channels), atol=1e-5)

    def test_tail_multi_return_composes(self):
        """Dual-return + tail compose: per-return tail chains with
        min_depth re-gating.  Two opaque walls: return 1 ~10 m, return 2
        ~20 m, identical with and without a (non-truncating) tail pass.
        y offsets are NOT symmetric: +-y pairs have exactly equal center
        ranges and the tail cutoff's strict rng > kth filter drops exact
        ties (documented in _tile_range_cutoff; measure-zero for real
        geometry)."""
        n = 40
        ys = np.linspace(-1.93, 2.07, 20)
        means = np.concatenate([
            np.stack([np.full(20, 10.0), ys, np.zeros(20)], 1),
            np.stack([np.full(20, 20.0), ys, np.zeros(20)], 1)]).astype(
            np.float32)
        quats = np.tile(np.array([0.7071068, 0, 0.7071068, 0], np.float32),
                        (n, 1))
        sh = np.zeros((n, 16, 3), np.float32)
        sh[:, 0] = 0.8
        b = composite.SurfelBundle(
            means=jnp.asarray(means), rotations=jnp.asarray(quats),
            scales=jnp.full((n, 2), 0.8), opacities=jnp.full((n,), 0.99),
            sh=jnp.asarray(sh))
        grid8 = rays_lib.SensorGrid.from_bounds(8, (-0.02, 0.02))

        def run(tail, k):
            tile = binning.TileConfig(tile_h=8, tile_w=64, max_per_tile=k)
            cfg = tracer.TraceConfig(tile=tile, engine="jax",
                                     exact_order=False, tail_passes=tail)
            return tracer.render_multi_return(b, grid8, 256, jnp.eye(4),
                                              0, cfg, return_gap=2.0)
        r1, r2 = run(tail=1, k=40)
        assert abs(float(r1["depth"][4, 128]) - 10.0) < 0.5
        assert abs(float(r2["depth"][4, 128]) - 20.0) < 0.5
        # tail with K=16 (truncating: walls overlap > 16 per tile) must
        # recover the K=40 untruncated result
        s1, s2 = run(tail=2, k=16)
        np.testing.assert_allclose(np.asarray(s1["depth"]),
                                   np.asarray(r1["depth"]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(s2["depth"]),
                                   np.asarray(r2["depth"]), atol=1e-4)
class TestResolveEngine:
    """TraceConfig.resolve_engine routing rules."""

    def _cfg(self, **kw):
        tile_kw = {k: kw.pop(k) for k in ("max_per_tile",) if k in kw}
        tile = binning.TileConfig(tile_h=16, tile_w=128,
                                  **(tile_kw or {"max_per_tile": 128}))
        return tracer.TraceConfig(tile=tile, **kw)

    def test_explicit_jax(self):
        assert self._cfg(engine="jax").resolve_engine(16, 256, None) == "jax"

    def test_explicit_pallas_honored_off_tpu(self):
        # CI runs on CPU: explicit pallas routes to the interpreter.
        cfg = self._cfg(engine="pallas")
        assert cfg.resolve_engine(16, 256, None) == "pallas"

    def test_explicit_pallas_shape_check(self):
        cfg = self._cfg(engine="pallas", max_per_tile=100)
        with pytest.raises(ValueError):
            cfg.resolve_engine(16, 256, None)

    def test_auto_off_tpu_is_jax(self):
        if jax.default_backend() == "tpu":
            pytest.skip("auto resolves to pallas on TPU")
        cfg = self._cfg(engine="auto")
        assert cfg.resolve_engine(16, 256, None) == "jax"


class TestTailChainAssignments:
    def test_precomputed_chain_matches_rebinning(self):
        """trace(assignment=bin_tail_chain(...)) must equal the
        re-binning tail path (the trainer's cached-chain contract)."""
        from lidar_rt_tpu.core import transforms
        b = _random_bundle(140, seed=5, spread=4.0,
                           opacity_range=(0.2, 0.6))
        tile = binning.TileConfig(tile_h=32, tile_w=128, max_per_tile=32)
        cfg = tracer.TraceConfig(tile=tile, engine="jax",
                                 exact_order=False, tail_passes=2)
        ref = tracer.trace(b, GRID, WIDTH, S2W, BG, 3, cfg)
        chain = tracer.bin_tail_chain(
            b, GRID, WIDTH, transforms.invert_se3(S2W), tile, passes=2)
        out = tracer.trace(b, GRID, WIDTH, S2W, BG, 3, cfg,
                           assignment=chain)
        np.testing.assert_allclose(np.asarray(out.channels),
                                   np.asarray(ref.channels), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.accum_weights),
                                   np.asarray(ref.accum_weights),
                                   atol=1e-6)

    def test_chain_length_mismatch_raises(self):
        from lidar_rt_tpu.core import transforms
        b = _random_bundle(40, seed=1)
        tile = binning.TileConfig(tile_h=32, tile_w=128, max_per_tile=32)
        cfg = tracer.TraceConfig(tile=tile, engine="jax", tail_passes=2)
        chain = tracer.bin_tail_chain(
            b, GRID, WIDTH, transforms.invert_se3(S2W), tile, passes=1)
        with pytest.raises(ValueError):
            tracer.trace(b, GRID, WIDTH, S2W, BG, 3, cfg,
                         assignment=chain)
