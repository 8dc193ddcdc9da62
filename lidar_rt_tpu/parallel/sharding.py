"""shard_map ray-band tracing and mesh helpers."""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from lidar_rt_tpu.core import rays as rays_lib
from lidar_rt_tpu.ops import tracer as tracer_lib
from lidar_rt_tpu.ops.composite import RenderOutputs, SurfelBundle

Array = jax.Array


def make_mesh(dp: int = 1, rays: int | None = None,
              devices=None) -> Mesh:
    """A ("dp", "rays") mesh over the available devices.

    rays=None uses all remaining devices on the ray axis.  Lay the ray axis
    innermost so band-neighbour collectives ride the fastest ICI links.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    rays = n // dp if rays is None else rays
    if dp * rays != n:
        raise ValueError(f"dp={dp} * rays={rays} != {n} devices")
    return Mesh(devices.reshape(dp, rays), ("dp", "rays"))


def trace_ray_sharded(bundle: SurfelBundle, grid: rays_lib.SensorGrid,
                      width: int, sensor2world: Array, background: Array,
                      active_sh_degree, cfg: tracer_lib.TraceConfig,
                      mesh: Mesh, axis: str = "rays") -> RenderOutputs:
    """Trace with the azimuth axis sharded over `axis` of `mesh`.

    Each device renders the column band it owns (surfels replicated); the
    channels output is width-sharded in place, and per-surfel accumulated
    weights are psum'd across bands.  Differentiable: the transpose of the
    replicated-bundle broadcast is the gradient psum over ICI.
    """
    n_band = mesh.shape[axis]
    if width % n_band:
        raise ValueError(f"width {width} not divisible by {n_band} bands")
    band_w = width // n_band

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(), P(), P()),
        out_specs=(P(None, axis, None), P()),
    )
    def shard_fn(bundle, sensor2world, background):
        band = jax.lax.axis_index(axis)
        # Static band width; dynamic offset enters through ray generation.
        out = _trace_band(bundle, sensor2world, background,
                          band * band_w)
        return out.channels, jax.lax.psum(out.accum_weights, axis)

    def _trace_band(bundle, s2w, bg, col_offset):
        # trace() takes a static col_offset; make it dynamic by rolling the
        # raster: render band [0, band_w) of a grid whose azimuth is offset.
        # Simpler and exact: build rays for the full raster and slice — but
        # that defeats sharding.  Instead we exploit that trace()'s
        # col_offset only enters index arithmetic mod W: pass it via a
        # dynamic roll of the column index.
        return tracer_lib.trace(
            bundle, grid, width, s2w, bg, active_sh_degree, cfg,
            col_offset=col_offset, render_width=band_w)

    channels, accum = shard_fn(bundle, sensor2world, background)
    return RenderOutputs(channels=channels.reshape(grid.height, width, 9)
                         if channels.ndim != 3 else channels,
                         accum_weights=accum)
