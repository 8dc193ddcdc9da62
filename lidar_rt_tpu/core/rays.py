"""Spherical range-image ray model: the sensor raster every layer shares.

A LiDAR scan is an equirectangular raster: column -> azimuth, row ->
inclination (per-beam table for Waymo, linear bounds for KITTI-360).  The
pixel mapping matches the reference exactly so range images, rays and
projections are interchangeable (reference lib/scene/lidar_sensor.py:325-434;
pixel offsets :42-51):

    col j:  x = (W - j - pixel_offset) / W,  azimuth = 2*pi*x - pi - angle_offset
    row i:  inclination = row_inclinations[i]   (monotone decreasing in i)

This module is also the foundation of the tracer's tile binning: surfel
footprints are mapped to pixel rectangles through the same `pixel_of_*`
functions, which is what lets the TPU engine replace the reference's BVH.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SensorGrid:
    """Static description of a LiDAR scan raster.

    row_inclinations: (H,) inclination per row, strictly decreasing (row 0 is
    the top beam).  For linear-bound sensors (KITTI-360) this is the sampled
    closed form; for beam-table sensors (Waymo) the calibrated beam list.
    """

    row_inclinations: Array
    pixel_offset: float
    angle_offset: float

    @property
    def height(self) -> int:
        return self.row_inclinations.shape[0]

    @staticmethod
    def from_bounds(height: int, inclination_bounds: tuple[float, float],
                    pixel_offset: float = 0.0, angle_offset: float = 0.0) -> "SensorGrid":
        """Linear inclination raster: row i -> ((H - i - off)/H)*(hi-lo) + lo."""
        lo, hi = inclination_bounds
        i = np.arange(height, dtype=np.float32)
        grid_y = (height - i - pixel_offset) / float(height)
        rows = grid_y * (hi - lo) + lo
        return SensorGrid(jnp.asarray(rows, jnp.float32),
                          float(pixel_offset), float(angle_offset))

    @staticmethod
    def from_beams(beam_inclinations: Array, pixel_offset: float = 0.5,
                   angle_offset: float = 0.0) -> "SensorGrid":
        """Beam-table raster; beams given bottom-up (Waymo calibration order),
        stored top-down."""
        rows = jnp.asarray(beam_inclinations, jnp.float32)[::-1]
        return SensorGrid(rows, float(pixel_offset), float(angle_offset))


def azimuth_of_col(grid: SensorGrid, col: Array, width: int) -> Array:
    """Column index (float ok) -> azimuth in radians."""
    x = (width - col - grid.pixel_offset) / float(width)
    return x * (2.0 * jnp.pi) - jnp.pi - grid.angle_offset


def col_of_azimuth(grid: SensorGrid, azimuth: Array, width: int) -> Array:
    """Azimuth -> fractional column index, wrapped into [0, W)."""
    x = (azimuth + jnp.pi + grid.angle_offset) / (2.0 * jnp.pi)
    col = width - grid.pixel_offset - x * width
    return jnp.mod(col, float(width))


def row_of_inclination(grid: SensorGrid, inclination: Array) -> Array:
    """Inclination -> fractional row index.

    Piecewise-linear over the (monotone decreasing) row table, extrapolating
    linearly past both edges — binning needs a finite, order-preserving
    answer for footprints that poke past the first/last beam.
    """
    rows_rev = grid.row_inclinations[::-1]  # increasing
    h = jnp.shape(rows_rev)[0]
    # Branchless searchsorted: count table entries < x.  The beam table is
    # tiny (64-128 rows) so the broadcast compare is one fused VPU pass,
    # where jnp.searchsorted lowers to a gather-per-step bisection loop
    # that dominates the binner's per-surfel stage on 100k+ points.
    x = inclination[..., None]
    hi = jnp.clip(jnp.sum((rows_rev < x).astype(jnp.int32), axis=-1),
                  1, h - 1)
    lo = hi - 1
    # Gather-free table lookup: rows_rev[lo]/[hi] as one-hot masked sums
    # over the (tiny) table axis.  TPU gathers run ~a row per cycle, so two
    # (N,)-indexed gathers dominate this whole function on 100k+ points;
    # two extra broadcast passes over (..., H) are ~20x cheaper.
    j = jnp.arange(h)
    x0 = jnp.sum(jnp.where(j == lo[..., None], rows_rev, 0.0), axis=-1)
    x1 = jnp.sum(jnp.where(j == hi[..., None], rows_rev, 0.0), axis=-1)
    frac = (inclination - x0) / jnp.maximum(x1 - x0, 1e-12)
    idx_rev = lo.astype(inclination.dtype) + frac
    return (h - 1) - idx_rev


def sensor_dirs(grid: SensorGrid, width: int) -> Array:
    """Unit ray directions in the sensor frame, (H, W, 3)."""
    cols = jnp.arange(width, dtype=jnp.float32)
    azimuth = azimuth_of_col(grid, cols, width)[None, :]
    inclination = grid.row_inclinations[:, None]
    cos_i = jnp.cos(inclination)
    d = jnp.stack(
        [
            jnp.broadcast_to(cos_i, (grid.height, width)) * jnp.cos(azimuth),
            jnp.broadcast_to(cos_i, (grid.height, width)) * jnp.sin(azimuth),
            jnp.broadcast_to(jnp.sin(inclination), (grid.height, width))
            * jnp.ones_like(azimuth),
        ],
        axis=-1,
    )
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def range_rays(grid: SensorGrid, width: int, sensor2world: Array
               ) -> tuple[Array, Array]:
    """World-frame rays for a frame: origin (3,), directions (H, W, 3).

    sensor2world: (4, 4).  All rays share the sensor center as origin
    (reference lidar_sensor.py:395-434 expands it per pixel; we keep it as a
    single vector — the tracer exploits the shared origin heavily).
    """
    d = sensor_dirs(grid, width)
    rot = sensor2world[:3, :3]
    world_d = jnp.einsum("ij,hwj->hwi", rot, d,
                        precision=jax.lax.Precision.HIGHEST)
    world_d = world_d / jnp.linalg.norm(world_d, axis=-1, keepdims=True)
    return sensor2world[:3, 3], world_d


def range_to_points(grid: SensorGrid, range_map: Array, sensor2world: Array
                    ) -> Array:
    """Back-project a range image (H, W) to world points (H, W, 3)."""
    h, w = range_map.shape
    d = sensor_dirs(grid, w)
    pts = d * range_map[..., None]
    return (jnp.einsum("ij,hwj->hwi", sensor2world[:3, :3], pts,
                       precision=jax.lax.Precision.HIGHEST)
            + sensor2world[:3, 3])


def project_points(grid: SensorGrid, points_world: Array, world2sensor: Array,
                   width: int) -> tuple[Array, Array, Array]:
    """World points (..., 3) -> (row, col, range) in the raster.

    Rows/cols are fractional; callers quantize/clip.  Used by the tile binner
    (surfel centers) and by data loaders that rasterize raw point clouds.
    """
    p = (jnp.einsum("ij,...j->...i", world2sensor[:3, :3], points_world,
                    precision=jax.lax.Precision.HIGHEST)
         + world2sensor[:3, 3])
    rng = jnp.linalg.norm(p, axis=-1)
    azimuth = jnp.arctan2(p[..., 1], p[..., 0])
    horiz = jnp.maximum(jnp.linalg.norm(p[..., :2], axis=-1), 1e-12)
    inclination = jnp.arctan2(p[..., 2], horiz)
    return (row_of_inclination(grid, inclination),
            col_of_azimuth(grid, azimuth, width), rng)
