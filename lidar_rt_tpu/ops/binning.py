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
    """

    tile_h: int = 32
    tile_w: int = 128
    max_per_tile: int = 512
    cutoff_eps: float = 0.01

    def num_tiles(self, height: int, width: int) -> tuple[int, int]:
        """Tile counts with ceiling division — rasters whose dims don't
        divide are handled by the tracer with wrap/clamp-padded rays."""
        return (-(-height // self.tile_h), -(-width // self.tile_w))


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


def bin_surfels(grid: rays_lib.SensorGrid, width: int, world2sensor: Array,
                means: Array, scales: Array, opacities: Array,
                cfg: TileConfig, col_offset: int = 0,
                num_cols: int | None = None) -> TileAssignment:
    """Assign surfels to range-image tiles.

    means (N, 3) world; returns per-tile nearest-first candidate lists.
    Tiles are indexed row-major over (tiles_y, tiles_x).

    col_offset/num_cols restrict binning to a column band [col_offset,
    col_offset + num_cols) of the full raster — the unit of ray-parallel
    sharding across chips (each device bins + renders its own band).
    """
    h = grid.height
    n = means.shape[0]
    num_cols = width if num_cols is None else num_cols
    tiles_y, tiles_x = cfg.num_tiles(h, num_cols)
    t_total = tiles_y * tiles_x

    row_c, col_c, rng = rays_lib.project_points(grid, means, world2sensor,
                                                width)
    radius = cutoff_radius(scales, opacities, cfg.cutoff_eps)
    safe_rng = jnp.maximum(rng, geometry.DEPTH_MIN)
    ang = jnp.arctan2(radius, safe_rng)

    # Sensor-frame inclination of the center (project_points recomputes it
    # internally; reproduce it here for the row bound).
    p = (jnp.einsum("ij,nj->ni", world2sensor[:3, :3], means,
                    precision=jax.lax.Precision.HIGHEST)
         + world2sensor[:3, 3])
    horiz = jnp.maximum(jnp.linalg.norm(p[:, :2], axis=-1), 1e-12)
    incl = jnp.arctan2(p[:, 2], horiz)

    # Row interval: inclinations are monotone decreasing in row index.
    row_lo = rays_lib.row_of_inclination(grid, incl + ang)   # smaller row
    row_hi = rays_lib.row_of_inclination(grid, incl - ang)
    # Azimuth half-width in columns (azimuth circle shrinks by cos incl).
    col_half = (ang / jnp.maximum(jnp.cos(incl), 1e-3)) \
        * (width / (2.0 * jnp.pi))
    col_half = jnp.minimum(col_half, width / 2.0)

    live = (opacities > geometry.ALPHA_MIN) & (rng > geometry.DEPTH_MIN)

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
    row_overlap = (row_lo[None, :] <= tile_row_hi[:, None] - 0.5) \
        & (row_hi[None, :] >= tile_row_lo[:, None] - 0.5)
    dcol = jnp.abs(col_c[None, :] - tile_col_c[:, None])
    dcol = jnp.minimum(dcol, width - dcol)                   # azimuth wrap
    col_overlap = dcol <= (col_half[None, :] + tile_col_half + 0.5)

    overlap = (row_overlap[:, None, :] & col_overlap[None, :, :]
               & live[None, None, :]).reshape(t_total, n)

    # Nearest-first top-K per tile.  (A cumsum+scatter selection avoiding
    # top_k was tried and is slower: arbitrary scatters serialize on TPU.)
    score = jnp.where(overlap, rng[None, :], jnp.inf)
    k = min(cfg.max_per_tile, n)
    neg_top, idx = jax.lax.top_k(-score, k)                  # nearest first
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
