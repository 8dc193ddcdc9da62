"""Surfel -> range-image tile binning: the TPU replacement for the BVH.

The reference builds an OptiX GAS over per-splat proxy quads every iteration
(lib/gaussian_renderer/__init__.py:142-145, trace_surfels.cpp:46-148) because
camera rays are unstructured.  LiDAR rays are a *structured spherical
raster*, so visibility is a binning problem: project each surfel center into
the raster, bound its angular footprint with the same opacity-adaptive 3-sigma
cutoff the proxy quads use (lib/utils/primitive_utils.py:201-205), and list
the surfels touching each (tile_h x tile_w) tile of the range image.

Per tile we keep the K nearest candidates by center range (static shapes; a
`truncated` count reports overflow).  `lax.top_k` over a (T, N) score matrix
doubles as the global depth sort — candidates come out nearest-first, which
is the compositing order (the tile-sorted approximation of the reference's
exact per-ray k-buffer order; the tracer can optionally re-sort per ray).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lidar_rt_tpu.core import rays as rays_lib
from lidar_rt_tpu.ops import geometry

Array = jax.Array


@dataclass(frozen=True)
class TileConfig:
    """Static tiling parameters.

    tile_h/tile_w: tile shape in pixels (rows are few on LiDAR rasters —
    tiles should be wide in azimuth).  max_per_tile: K candidate slots.
    cutoff_eps mirrors the reference's +0.01 pad on the opacity-adaptive
    cutoff radius (primitive_utils.py:205).

    binner: "topk" scores a dense (T, N) overlap matrix (cost grows with
    tile count); "sort" emits up to dup_rows x dup_cols (tile, surfel)
    duplicates per surfel and radix-sorts one (tile, range) key stream —
    the 3DGS-style path whose cost is ~independent of tile count.
    Surfels whose footprint spans more tiles than the dup caps lose their
    outermost tiles (bounded by the prune-size threshold during training).
    """

    tile_h: int = 32
    tile_w: int = 128
    max_per_tile: int = 512
    cutoff_eps: float = 0.01
    binner: str = "topk"
    dup_rows: int = 2
    dup_cols: int = 8
    coarse_factor: int = 8   # hier binner: coarse K = coarse_factor * K
    # hier binner macro level: pre-select per macro column sector
    # (macro_cols wide, 0 = off) so the per-tile-sector stage scores a
    # (tiles_x, K_a) matrix instead of (tiles_x, N) — the stage whose cost
    # grows with azimuth tile count.  K_a = macro_factor * coarse K.
    macro_cols: int = 0
    macro_factor: int = 4
    # TPU-native approximate top-k (jax.lax.approx_max_k) for the candidate
    # selection.  Binning is a stop-gradient visibility oracle (like the
    # reference's BVH), so a bounded recall loss only risks dropping a few
    # of the per-tile FARTHEST candidates — the ones the K budget would
    # truncate first anyway.
    approx_topk: bool = False
    approx_recall: float = 0.95
    # Extra footprint padding in pixels (both axes).  Used when a tile
    # assignment is REUSED across training steps (rebin-interval
    # amortization): the pad absorbs the parameter drift between rebins so
    # a splat moving toward a tile boundary stays listed.  0 for
    # bin-every-step operation.
    pad_px: float = 0.0
    # Discrete-sample existence cull.  Rays live at INTEGER (row, col)
    # raster coordinates, but the footprint test is continuous: a far
    # splat whose sub-pixel footprint sits BETWEEN rows/columns overlaps
    # tiles while containing no actual ray sample — its alpha is below
    # ALPHA_MIN at every ray of the frame (the footprint box bounds the
    # alpha >= 1/255 region, primitive_utils.py:201-205 semantics), so it
    # contributes zero weight and zero gradient in the kernel, yet burns a
    # candidate slot and per-pair math in every tile it touches.  Ground
    # surfels seen at grazing incidence (tiny oriented row silhouette) make
    # this the dominant binning overcount at range.  The cull drops any
    # splat whose padded footprint contains no integer row in [0, H-1] or
    # no integer column — output- and gradient-exact by construction.
    sample_snap: bool = True
    # Margin (px) for the sample_snap existence test.  None -> use pad_px
    # (the cull stays an exact superset of the reused-assignment window).
    # Under rebin amortization pad_px=2 makes the test vacuous (a 4 px-
    # padded interval always contains an integer), yet measured parameter
    # drift between rebins is far below 1 px (lr-sized steps; the cache is
    # invalidated at every surfel-set change anyway) — so trainers set a
    # tighter snap margin (e.g. 0.5) while keeping the wide tile-overlap
    # pad.  A culled splat only re-enters at the next rebin, like any
    # footprint that drifts across a tile boundary.
    snap_pad_px: float | None = None
    # Integer-sample tile-overlap test (the per-TILE analogue of
    # sample_snap).  The classic test is continuous with +-0.5 px slack:
    # a footprint grazing a tile band passes even when the overlap region
    # contains no integer (row, col) — no actual ray.  With int_overlap a
    # (tile, splat) pair is listed only when the padded footprint box
    # intersected with the tile contains an integer sample on BOTH axes.
    # Measured on the bench street soup (scripts/overcount_probe.py):
    # cuts ~15% of binned pairs, nearly output-exact (the alpha >= 1/255
    # region is inside the box, so a sample-free box overlap passes the
    # gate nowhere in the tile); int_eps guards the footprint bound's own
    # approximation error at the box edge (8 of 136k gate-passing pairs
    # sat within 0.5 px outside the unpadded box).  pad_px still applies
    # (rebin-drift absorption is unchanged).
    int_overlap: bool = True
    int_eps: float = 0.25

    def num_tiles(self, height: int, width: int) -> tuple[int, int]:
        """Tile counts with ceiling division — rasters whose dims don't
        divide are handled by the tracer with wrap/clamp-padded rays."""
        return (-(-height // self.tile_h), -(-width // self.tile_w))


def _int_row_overlap(row_lo, row_hi, t_lo, t_hi, eps: float):
    """Integer-sample row overlap: does [row_lo - eps, row_hi + eps]
    intersected with the tile's integer rows [t_lo, t_hi - 1] contain an
    integer?  Tighter than the continuous +-0.5 px test — rays only exist
    at integer rows (broadcasting shapes)."""
    return (jnp.floor(jnp.minimum(row_hi + eps, t_hi - 1.0))
            >= jnp.ceil(jnp.maximum(row_lo - eps, t_lo)))


def _int_col_overlap(o, col_half, tw: int, width: float, eps: float):
    """Integer-sample column overlap.  o: SIGNED circular offset of the
    footprint center from the tile's first integer column; the +-width
    shifted retests cover footprints whose circular interval wraps the
    azimuth seam (col_half is clamped to width/2, so three linear tests
    cover every circular interval)."""
    ch = col_half + eps

    def hit(oo):
        return (jnp.floor(jnp.minimum(oo + ch, tw - 1.0))
                >= jnp.ceil(jnp.maximum(oo - ch, 0.0)))

    return hit(o) | hit(o + width) | hit(o - width)


def _signed_col_offset(col_c, first_col, width: float):
    """Signed circular offset (-width/2, width/2] of footprint centers
    from tile first-column positions (broadcasting shapes)."""
    o = jnp.mod(col_c - first_col, width)
    return jnp.where(o > width / 2.0, o - width, o)


def _top_k(cfg: TileConfig, neg_score: Array, k: int):
    """Exact or approximate nearest-K selection on a (T, N) score matrix."""
    if cfg.approx_topk:
        return jax.lax.approx_max_k(neg_score, k,
                                    recall_target=cfg.approx_recall)
    return jax.lax.top_k(neg_score, k)


class TileAssignment(NamedTuple):
    """index (T, K) surfel ids (N = invalid sentinel, clipped for gathers),
    valid (T, K) mask, nearest-first; truncated (T,) overflow counts."""

    index: Array
    valid: Array
    truncated: Array


def cutoff_radius(scales: Array, opacities: Array, eps: float) -> Array:
    """Opacity-adaptive splat support radius in world units.

    The reference's proxy quad spans s * (sqrt(2 ln(255 op)) + 0.01)
    (primitive_utils.py:201-205); outside it alpha < 1/255 and the
    compositor would skip the hit anyway.  scales (N, 2) -> (N,).
    """
    max_scale = jnp.max(scales, axis=-1)
    cut = jnp.sqrt(2.0 * jnp.log(jnp.maximum(opacities * 255.0, 1.0 + 1e-6)))
    return max_scale * (cut + eps)


def footprint_bounds(grid: rays_lib.SensorGrid, width: int,
                     world2sensor: Array, means: Array, scales: Array,
                     opacities: Array, cfg: TileConfig,
                     rotations: Array | None = None
                     ) -> tuple[Array, Array, Array, Array, Array, Array]:
    """Stage 0 of binning: per-surfel raster footprint bounds.

    Returns (row_lo, row_hi, col_c, col_half, rng, live) — the projected
    center column, the row interval covered by the splat's angular extent,
    its azimuth half-width in columns, center range, and liveness.

    rotations (N, 4) enables ORIENTED footprint bounds: the angular extent
    of the splat disk is its support function along the elevation/azimuth
    tangents instead of an isotropic bounding sphere.  This matters
    enormously for ground surfels seen at grazing incidence — flat disks
    have a tiny vertical silhouette but a large bounding sphere, and the
    isotropic bound floods every row tile with near-ground candidates,
    evicting the true (farther) candidates from the K budget.

    Written structure-of-arrays: every operation is on (N,) component
    vectors.  (N, 3) / (N, 3, 3) intermediates put the size-3 axis in the
    TPU lane dimension (3 of 128 lanes used) — measured 7x slower for this
    whole stage.  Tangent-frame sines/cosines come from the Cartesian
    components directly (sin_a = py / horiz etc.), not sin(atan2(...)).
    """
    mx, my, mz = means[:, 0], means[:, 1], means[:, 2]
    r = world2sensor
    px = r[0, 0] * mx + r[0, 1] * my + r[0, 2] * mz + r[0, 3]
    py = r[1, 0] * mx + r[1, 1] * my + r[1, 2] * mz + r[1, 3]
    pz = r[2, 0] * mx + r[2, 1] * my + r[2, 2] * mz + r[2, 3]
    horiz = jnp.maximum(jnp.sqrt(px * px + py * py), 1e-12)
    rng = jnp.sqrt(px * px + py * py + pz * pz)
    safe_rng = jnp.maximum(rng, geometry.DEPTH_MIN)
    incl = jnp.arctan2(pz, horiz)
    azim = jnp.arctan2(py, px)
    col_c = rays_lib.col_of_azimuth(grid, azim, width)

    cut = jnp.sqrt(2.0 * jnp.log(jnp.maximum(opacities * 255.0,
                                             1.0 + 1e-6))) + cfg.cutoff_eps
    if rotations is None:
        radius = jnp.max(scales, axis=-1) * cut
        ang_row = jnp.arctan2(radius, safe_rng)
        ang_col = ang_row
    else:
        # Unit-direction trig from components (no sin/cos/atan2 maps).
        inv_rng = 1.0 / safe_rng
        sin_i = pz * inv_rng
        cos_i = horiz * inv_rng
        inv_h = 1.0 / horiz
        sin_a = py * inv_h
        cos_a = px * inv_h

        # Splat-plane axis columns R(q)[:, 0] and R(q)[:, 1], componentwise.
        qn = rotations / jnp.maximum(
            jnp.linalg.norm(rotations, axis=-1, keepdims=True), 1e-12)
        qw, qx, qy, qz = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
        c0x = 1.0 - 2.0 * (qy * qy + qz * qz)
        c0y = 2.0 * (qx * qy + qw * qz)
        c0z = 2.0 * (qx * qz - qw * qy)
        c1x = 2.0 * (qx * qy - qw * qz)
        c1y = 1.0 - 2.0 * (qx * qx + qz * qz)
        c1z = 2.0 * (qy * qz + qw * qx)

        # Rotate into the sensor frame and scale by the cutoff extent.
        e0 = scales[:, 0] * cut
        e1 = scales[:, 1] * cut
        s1x = e0 * (r[0, 0] * c0x + r[0, 1] * c0y + r[0, 2] * c0z)
        s1y = e0 * (r[1, 0] * c0x + r[1, 1] * c0y + r[1, 2] * c0z)
        s1z = e0 * (r[2, 0] * c0x + r[2, 1] * c0y + r[2, 2] * c0z)
        s2x = e1 * (r[0, 0] * c1x + r[0, 1] * c1y + r[0, 2] * c1z)
        s2y = e1 * (r[1, 0] * c1x + r[1, 1] * c1y + r[1, 2] * c1z)
        s2z = e1 * (r[2, 0] * c1x + r[2, 1] * c1y + r[2, 2] * c1z)

        def support(dx, dy, dz):
            d1 = s1x * dx + s1y * dy + s1z * dz
            d2 = s2x * dx + s2y * dy + s2z * dz
            return jnp.sqrt(d1 * d1 + d2 * d2)

        # Tangents: e = (-sin_i cos_a, -sin_i sin_a, cos_i),
        #           a = (-sin_a, cos_a, 0), d = (cos_i cos_a, cos_i sin_a,
        #           sin_i).  Perspective safety: the nearest point of the
        #           disk along the view direction shortens the range.
        rng_eff = jnp.maximum(safe_rng - support(cos_i * cos_a,
                                                 cos_i * sin_a, sin_i),
                              geometry.DEPTH_MIN)
        ang_row = jnp.arctan2(support(-sin_i * cos_a, -sin_i * sin_a,
                                      cos_i), rng_eff)
        ang_col = jnp.arctan2(support(-sin_a, cos_a,
                                      jnp.zeros_like(sin_a)), rng_eff)

    # Row interval: inclinations are monotone decreasing in row index.
    row_lo = rays_lib.row_of_inclination(grid, incl + ang_row) - cfg.pad_px
    row_hi = rays_lib.row_of_inclination(grid, incl - ang_row) + cfg.pad_px
    # Azimuth half-width in columns (azimuth circle shrinks by cos incl).
    col_half = (ang_col / jnp.maximum(jnp.cos(incl), 1e-3)) \
        * (width / (2.0 * jnp.pi)) + cfg.pad_px
    col_half = jnp.minimum(col_half, width / 2.0)

    live = (opacities > geometry.ALPHA_MIN) & (rng > geometry.DEPTH_MIN)
    if cfg.sample_snap:
        # Integer-sample existence (see TileConfig.sample_snap).  Rows
        # clip to the physical beam range [0, H-1] (row_of_inclination
        # extrapolates past the raster; there are no rays out there) —
        # raster padding duplicates edge rays, adding no new samples.
        # Columns cover the full azimuth circle at every integer, so the
        # wrap never changes integer existence.  The test margin is
        # snap_pad_px (pad_px if unset); row_lo/row_hi/col_half above
        # already carry pad_px, so shift by the difference.
        d = 0.0 if cfg.snap_pad_px is None else cfg.pad_px - cfg.snap_pad_px
        has_row = (jnp.floor(jnp.minimum(row_hi - d, grid.height - 1.0))
                   >= jnp.ceil(jnp.maximum(row_lo + d, 0.0)))
        has_col = (jnp.floor(col_c + col_half - d)
                   >= jnp.ceil(col_c - (col_half - d)))
        live &= has_row & has_col
    return row_lo, row_hi, col_c, col_half, rng, live


def bin_surfels(grid: rays_lib.SensorGrid, width: int, world2sensor: Array,
                means: Array, scales: Array, opacities: Array,
                cfg: TileConfig, col_offset: int = 0,
                num_cols: int | None = None,
                rotations: Array | None = None,
                min_range: Array | None = None) -> TileAssignment:
    """Assign surfels to range-image tiles.

    means (N, 3) world; returns per-tile nearest-first candidate lists.
    Tiles are indexed row-major over (tiles_y, tiles_x).

    col_offset/num_cols restrict binning to a column band [col_offset,
    col_offset + num_cols) of the full raster — the unit of ray-parallel
    sharding across chips (each device bins + renders its own band).

    min_range (T,): per-tile strict lower bound on candidate center range
    — a tile only lists surfels with rng > min_range[t].  This is the
    re-binning half of tail re-tracing (ops/tracer tail_passes, the TPU
    counterpart of the reference's unbounded chunk re-launch loop,
    forward.cu:282-291): pass min_range = the range of each tile's K-th
    selected candidate and the next pass sees candidate ranks K+1, K+2, …
    """
    h = grid.height
    n = means.shape[0]
    num_cols = width if num_cols is None else num_cols
    tiles_y, tiles_x = cfg.num_tiles(h, num_cols)
    t_total = tiles_y * tiles_x

    row_lo, row_hi, col_c, col_half, rng, live = footprint_bounds(
        grid, width, world2sensor, means, scales, opacities, cfg, rotations)

    if cfg.binner == "sort":
        return _select_sorted(cfg, h, width, num_cols, col_offset, tiles_y,
                              tiles_x, row_lo, row_hi, col_c, col_half, rng,
                              live, min_range)
    if cfg.binner == "hier":
        return _select_hier(cfg, h, width, col_offset, tiles_y, tiles_x,
                            row_lo, row_hi, col_c, col_half, rng, live,
                            min_range)

    # Tile grids: (T,) centers/extents, row-major (ty, tx).
    ty = jnp.arange(tiles_y)
    tx = jnp.arange(tiles_x)
    tile_row_lo = (ty * cfg.tile_h).astype(jnp.float32)
    tile_row_hi = jnp.minimum((ty + 1) * cfg.tile_h, h).astype(jnp.float32)
    # Mod by W: band offsets / the last (wrap-padded) tile may pass the seam.
    tile_col_c = jnp.mod(col_offset + (tx.astype(jnp.float32) + 0.5)
                         * cfg.tile_w, float(width))
    tile_col_half = cfg.tile_w / 2.0

    # Overlap tests, all (T_y or T_x, N).
    if cfg.int_overlap:
        eps = cfg.int_eps
        row_overlap = _int_row_overlap(row_lo[None, :], row_hi[None, :],
                                       tile_row_lo[:, None],
                                       tile_row_hi[:, None], eps)
        first_col = jnp.mod(col_offset + tx.astype(jnp.float32)
                            * cfg.tile_w, float(width))
        o = _signed_col_offset(col_c[None, :], first_col[:, None],
                               float(width))
        col_overlap = _int_col_overlap(o, col_half[None, :], cfg.tile_w,
                                       float(width), eps)
    else:
        row_overlap = (row_lo[None, :] <= tile_row_hi[:, None] - 0.5) \
            & (row_hi[None, :] >= tile_row_lo[:, None] - 0.5)
        dcol = jnp.abs(col_c[None, :] - tile_col_c[:, None])
        dcol = jnp.minimum(dcol, width - dcol)               # azimuth wrap
        col_overlap = dcol <= (col_half[None, :] + tile_col_half + 0.5)

    overlap = (row_overlap[:, None, :] & col_overlap[None, :, :]
               & live[None, None, :]).reshape(t_total, n)
    if min_range is not None:
        overlap &= rng[None, :] > min_range[:, None]

    # Nearest-first top-K per tile.  (A cumsum+scatter selection avoiding
    # top_k was tried and is slower: arbitrary scatters serialize on TPU.)
    score = jnp.where(overlap, rng[None, :], jnp.inf)
    k = min(cfg.max_per_tile, n)
    neg_top, idx = _top_k(cfg, -score, k)                    # nearest first
    valid = jnp.isfinite(-neg_top)
    index = jnp.where(valid, idx, n)
    if k < cfg.max_per_tile:
        # Tiny scenes: pad to the configured K so downstream kernels see a
        # static candidate width.
        pad = cfg.max_per_tile - k
        index = jnp.pad(index, ((0, 0), (0, pad)), constant_values=n)
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    truncated = jnp.maximum(jnp.sum(overlap, axis=-1) - k, 0)
    return TileAssignment(index=index, valid=valid, truncated=truncated)


_RANGE_BITS = 18
_RANGE_MAX = 120.0


def _select_sorted(cfg: TileConfig, h: int, width: int, num_cols: int,
                   col_offset: int, tiles_y: int, tiles_x: int,
                   row_lo, row_hi, col_c, col_half, rng, live,
                   min_range=None) -> TileAssignment:
    """Duplication + single radix sort candidate selection.

    Each surfel emits up to dup_rows x (2 * dup_cols) (tile, surfel) pairs
    (the x2 covers the azimuth seam via a shifted second representation);
    one global argsort of packed (tile << 18 | quantized range) keys groups
    pairs by tile in nearest-first order, and per-tile lists are gathered
    from tile start offsets.  Cost is ~independent of tile count (TPU int
    sorts run at memory speed), unlike the (T, N) top_k path.
    """
    n = rng.shape[0]
    th, tw = cfg.tile_h, cfg.tile_w
    t_total = tiles_y * tiles_x
    k = cfg.max_per_tile

    # --- row tile interval (matches the topk overlap test) ---
    # The raw bounds stay UNCLIPPED for the validity test: clipping either
    # end would turn intervals entirely above/below the raster into false
    # hits on the first/last row tile.
    ty_min_raw = jnp.ceil((row_lo + 0.5) / th).astype(jnp.int32) - 1
    ty_max_raw = jnp.floor((row_hi + 0.5) / th).astype(jnp.int32)
    ty_min = jnp.clip(ty_min_raw, 0, tiles_y - 1)
    ty_max = jnp.minimum(ty_max_raw, tiles_y - 1)

    # --- column tile candidates: two shifted representations ---
    b = col_half + tw / 2.0 + 0.5
    u = jnp.mod(col_c - col_offset, float(width))            # (N,)
    tx_min_u = jnp.ceil((u - b) / tw - 0.5).astype(jnp.int32)
    tx_max_u = jnp.floor((u + b) / tw - 0.5).astype(jnp.int32)
    uw = u + width
    tx_min_w = jnp.ceil((uw - b) / tw - 0.5).astype(jnp.int32)

    dr, dc = cfg.dup_rows, cfg.dup_cols
    dy = jnp.arange(dr)[None, :, None, None]                 # (1, DR, 1, 1)
    dx = jnp.arange(dc)[None, None, :, None]                 # (1, 1, DC, 1)
    rep = jnp.arange(2)[None, None, None, :]                 # (1, 1, 1, 2)

    ty_c = ty_min[:, None, None, None] + dy                  # (N, DR, 1, 1)
    tx_start = jnp.stack([tx_min_u, tx_min_w], axis=-1)      # (N, 2)
    tx_c = tx_start[:, None, None, :] + dx                   # (N, 1, DC, 2)
    # seam dedup: the shifted representation must stay past the first one
    rep_ok = (rep == 0) | (tx_c > tx_max_u[:, None, None, None])

    row_ok = ((ty_c <= ty_max[:, None, None, None])
              & (ty_c >= ty_min_raw[:, None, None, None]))
    col_in = (tx_c >= 0) & (tx_c < tiles_x)
    # exact circular-distance recheck (caps/clips can't false-positive)
    tile_cc = jnp.mod(col_offset + (tx_c.astype(jnp.float32) + 0.5) * tw,
                      float(width))
    dcol = jnp.abs(col_c[:, None, None, None] - tile_cc)
    dcol = jnp.minimum(dcol, width - dcol)
    col_ok = dcol <= (col_half[:, None, None, None] + tw / 2.0 + 0.5)
    if cfg.int_overlap:
        # Integer-sample tightening (the ty/tx enumeration above is a
        # +-0.5-slack superset of the +-int_eps test, so filtering the
        # enumerated pairs is exact).
        t_lo = (ty_c * th).astype(jnp.float32)
        t_hi = jnp.minimum((ty_c + 1) * th, h).astype(jnp.float32)
        row_ok &= _int_row_overlap(row_lo[:, None, None, None],
                                   row_hi[:, None, None, None],
                                   t_lo, t_hi, cfg.int_eps)
        fc = jnp.mod(col_offset + tx_c.astype(jnp.float32) * tw,
                     float(width))
        o = _signed_col_offset(col_c[:, None, None, None], fc,
                               float(width))
        col_ok &= _int_col_overlap(o, col_half[:, None, None, None], tw,
                                   float(width), cfg.int_eps)

    valid = (row_ok & col_in & col_ok & rep_ok
             & live[:, None, None, None])                    # (N,DR,DC,2)
    tile_id = (jnp.clip(ty_c, 0, tiles_y - 1) * tiles_x
               + jnp.clip(tx_c, 0, tiles_x - 1))
    if min_range is not None:
        valid &= rng[:, None, None, None] > min_range[tile_id]

    qrange = jnp.clip(rng / _RANGE_MAX * (1 << _RANGE_BITS), 0,
                      (1 << _RANGE_BITS) - 1).astype(jnp.int32)
    key = jnp.where(valid,
                    (tile_id << _RANGE_BITS)
                    | qrange[:, None, None, None],
                    jnp.int32(2 ** 31 - 1)).reshape(-1)      # (N*D,)

    order = jnp.argsort(key)
    d_total = dr * dc * 2
    surf_sorted = (order // d_total).astype(jnp.int32)
    key_sorted = key[order]
    tile_sorted = key_sorted >> _RANGE_BITS                  # invalid -> big

    starts = jnp.searchsorted(tile_sorted, jnp.arange(t_total + 1),
                              method="scan_unrolled")
    slots = starts[:-1, None] + jnp.arange(k)[None, :]       # (T, K)
    valid_tk = slots < starts[1:, None]
    index = jnp.where(valid_tk,
                      surf_sorted[jnp.clip(slots, 0, surf_sorted.size - 1)],
                      n)
    truncated = jnp.maximum(starts[1:] - starts[:-1] - k, 0)
    return TileAssignment(index=index, valid=valid_tk, truncated=truncated)


def _select_hier(cfg: TileConfig, h: int, width: int, col_offset: int,
                 tiles_y: int, tiles_x: int, row_lo, row_hi, col_c,
                 col_half, rng, live, min_range=None) -> TileAssignment:
    """Two-level top-k: column sectors first, then row tiles.

    Stage 1 runs one (tiles_x, N) nearest-K_c selection per azimuth sector
    (row extent ignored).  Stage 2 refines each (row-tile, sector) pair over
    only the K_c = coarse_factor*K sector candidates — a (T, K_c) matrix,
    tiny compared to (T, N).  This makes fine row tiling affordable: the
    expensive top_k no longer scales with tiles_y.

    Exactness: equal to the flat topk binner whenever a sector's total
    column-overlap count is <= K_c (stage-1 truncation is counted in
    `truncated` otherwise).  With macro_cols > 0 an extra macro column
    level pre-selects K_a candidates per macro sector so this stage scores
    (tiles_x, K_a) instead of (tiles_x, N); a surfel overlapping a fine
    sector always overlaps its parent macro sector (the margin telescopes),
    so the macro level only adds (counted) nearest-K_a truncation.
    """
    n = rng.shape[0]
    k = cfg.max_per_tile
    k_c = min(cfg.coarse_factor * k, n)

    tx = jnp.arange(tiles_x)
    tile_col_c = jnp.mod(col_offset + (tx.astype(jnp.float32) + 0.5)
                         * cfg.tile_w, float(width))
    first_col = jnp.mod(col_offset + tx.astype(jnp.float32) * cfg.tile_w,
                        float(width))
    # Tail re-trace filter: the column stages must use each sector's MOST
    # PERMISSIVE (minimum) row-tile bound — a candidate already consumed
    # by one row tile may still be rank K+1 of a sibling tile.
    min_range_2d = None
    sector_min = None
    if min_range is not None:
        min_range_2d = min_range.reshape(tiles_y, tiles_x)
        sector_min = jnp.min(min_range_2d, axis=0)          # (tiles_x,)

    macro_trunc_tx = jnp.zeros((tiles_x,), jnp.int32)
    if cfg.macro_cols and cfg.macro_cols > cfg.tile_w \
            and cfg.macro_factor * k_c < n:
        g = max(cfg.macro_cols // cfg.tile_w, 1)
        m_total = -(-tiles_x // g)
        k_a = min(cfg.macro_factor * k_c, n)
        mx = jnp.arange(m_total)
        macro_c = jnp.mod(col_offset + (mx.astype(jnp.float32) * g + g / 2.0)
                          * cfg.tile_w, float(width))
        dcol_m = jnp.abs(col_c[None, :] - macro_c[:, None])
        dcol_m = jnp.minimum(dcol_m, width - dcol_m)
        over_m = (dcol_m <= (col_half[None, :]
                             + g * cfg.tile_w / 2.0 + 0.5)) \
            & live[None, :]                                 # (M, N)
        if sector_min is not None:
            pad = (-tiles_x) % g
            sm = jnp.pad(sector_min, (0, pad),
                         constant_values=jnp.inf) if pad else sector_min
            macro_min = jnp.min(sm.reshape(m_total, g), axis=1)
            over_m &= rng[None, :] > macro_min[:, None]
        score_m = jnp.where(over_m, rng[None, :], jnp.inf)
        neg_a, idx_a = _top_k(cfg, -score_m, k_a)           # (M, K_a)
        valid_a = jnp.isfinite(-neg_a)
        macro_trunc = jnp.maximum(jnp.sum(over_m, axis=-1) - k_a, 0)
        # Expand each fine sector's parent candidate list.
        parent = tx // g                                    # (tiles_x,)
        cand = idx_a[parent]                                # (tiles_x, K_a)
        cand_ok = valid_a[parent]
        packed_m = jnp.stack([col_c, col_half, rng], axis=-1)
        gm = packed_m[cand]                                 # (tiles_x, K_a, 3)
        col_c_x, col_half_x, rng_x = gm[..., 0], gm[..., 1], gm[..., 2]
        if cfg.int_overlap:
            o = _signed_col_offset(col_c_x, first_col[:, None],
                                   float(width))
            col_overlap = _int_col_overlap(
                o, col_half_x, cfg.tile_w, float(width),
                cfg.int_eps) & cand_ok                      # (tiles_x, K_a)
        else:
            dcol = jnp.abs(col_c_x - tile_col_c[:, None])
            dcol = jnp.minimum(dcol, width - dcol)
            col_overlap = (dcol <= (col_half_x + cfg.tile_w / 2.0 + 0.5)) \
                & cand_ok                                   # (tiles_x, K_a)
        if sector_min is not None:
            col_overlap &= rng_x > sector_min[:, None]
        score = jnp.where(col_overlap, rng_x, jnp.inf)
        kk_c = min(k_c, k_a)
        neg_top, sel_c = _top_k(cfg, -score, kk_c)
        valid_c = jnp.isfinite(-neg_top)
        idx_c = jnp.take_along_axis(cand, sel_c, axis=-1)   # (tiles_x, K_c)
        k_c = kk_c
        macro_trunc_tx = macro_trunc[parent]
    else:
        if cfg.int_overlap:
            o = _signed_col_offset(col_c[None, :], first_col[:, None],
                                   float(width))
            col_overlap = _int_col_overlap(
                o, col_half[None, :], cfg.tile_w, float(width),
                cfg.int_eps) & live[None, :]                # (tiles_x, N)
        else:
            dcol = jnp.abs(col_c[None, :] - tile_col_c[:, None])
            dcol = jnp.minimum(dcol, width - dcol)
            col_overlap = (dcol <= (col_half[None, :]
                                    + cfg.tile_w / 2.0 + 0.5)) \
                & live[None, :]                             # (tiles_x, N)
        if sector_min is not None:
            col_overlap &= rng[None, :] > sector_min[:, None]

        score = jnp.where(col_overlap, rng[None, :], jnp.inf)
        neg_top, idx_c = _top_k(cfg, -score, k_c)           # nearest first
        valid_c = jnp.isfinite(-neg_top)                    # (tiles_x, K_c)
    coarse_trunc = jnp.maximum(
        jnp.sum(col_overlap, axis=-1) - k_c, 0) \
        + macro_trunc_tx                                    # (tiles_x,)

    # Stage 2: row-tile refinement over sector candidates.  One packed
    # gather: TPU gathers cost ~a row per cycle, so three separate (N,)
    # gathers are ~3x one (N, 3) gather.
    packed = jnp.stack([row_lo, row_hi, rng], axis=-1)      # (N, 3)
    g = packed[idx_c]                                       # (tiles_x, K_c, 3)
    row_lo_c = g[..., 0]                                    # (tiles_x, K_c)
    row_hi_c = g[..., 1]
    rng_c = g[..., 2]
    ty = jnp.arange(tiles_y)
    t_row_lo = (ty * cfg.tile_h).astype(jnp.float32)
    t_row_hi = jnp.minimum((ty + 1) * cfg.tile_h, h).astype(jnp.float32)
    if cfg.int_overlap:
        row_ok = _int_row_overlap(
            row_lo_c[None], row_hi_c[None], t_row_lo[:, None, None],
            t_row_hi[:, None, None], cfg.int_eps) & valid_c[None]
    else:
        row_ok = ((row_lo_c[None] <= t_row_hi[:, None, None] - 0.5)
                  & (row_hi_c[None] >= t_row_lo[:, None, None] - 0.5)
                  & valid_c[None])                          # (ty, tx, K_c)
    if min_range_2d is not None:
        row_ok &= rng_c[None] > min_range_2d[:, :, None]

    fine_score = jnp.where(row_ok, rng_c[None], jnp.inf)
    kk = min(k, k_c)
    neg_f, sel = _top_k(cfg, -fine_score.reshape(-1, k_c), kk)
    valid = jnp.isfinite(-neg_f)                            # (T, kk)
    idx_flat = jnp.broadcast_to(idx_c[None], (tiles_y, tiles_x, k_c)) \
        .reshape(-1, k_c)
    index = jnp.where(valid, jnp.take_along_axis(idx_flat, sel, axis=-1), n)
    if kk < k:
        index = jnp.pad(index, ((0, 0), (0, k - kk)), constant_values=n)
        valid = jnp.pad(valid, ((0, 0), (0, k - kk)))
    truncated = (jnp.maximum(jnp.sum(row_ok, axis=-1).reshape(-1) - kk, 0)
                 + jnp.broadcast_to(coarse_trunc[None], (tiles_y, tiles_x)
                                    ).reshape(-1))
    return TileAssignment(index=index, valid=valid, truncated=truncated)
