"""Dense oracle renderer: the semantics definition of the surfel tracer.

Evaluates every (ray, surfel) pair — O(R*N), tiny scenes only — with plain
JAX ops, fully differentiable by autodiff.  This is the ground truth that the
tiled Pallas tracer (forward AND custom VJP) is validated against, and the
executable specification of the reference's OptiX kernels
(submodules/diff-lidar-tracer/optix_tracer/forward.cu / backward.cu).

Channel layout mirrors the reference (config.h:19-24):
    0:3  color   (intensity, ray-hit logit, ray-drop logit), SH-evaluated
    3    depth   (expected range)
    4    accum   (sum of compositing weights)
    5:8  normal  (composited signed plane normals; the reference's forward
                  writes zeros here but its backward treats the channel as
                  accumulated — we implement the accumulated semantics)
    8    final transmittance
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lidar_rt_tpu.core import sh as sh_lib
from lidar_rt_tpu.ops import geometry

Array = jax.Array

NUM_CHANNELS = 9
COLOR_SLICE = slice(0, 3)
DEPTH_CHANNEL = 3
ACCUM_CHANNEL = 4
NORMAL_SLICE = slice(5, 8)
FINAL_T_CHANNEL = 8


class SurfelBundle(NamedTuple):
    """Activated, world-frame surfel parameters ready to render.

    means:     (N, 3) world positions
    rotations: (N, 4) world quaternions (wxyz; need not be pre-normalized)
    scales:    (N, 2) positive splat extents
    opacities: (N,)   in (0, 1)
    sh:        (N, 16, 3) SH coefficients for the 3 view-dependent channels
    """

    means: Array
    rotations: Array
    scales: Array
    opacities: Array
    sh: Array

    @property
    def num_surfels(self) -> int:
        return self.means.shape[0]


class RenderOutputs(NamedTuple):
    """Flat per-ray channels (R, 9) + per-surfel accumulated weights (N,).

    raw_trans (tracer engines only): per-ray UNGATED transmittance
    product T0 * prod(1 - alpha) over every composited candidate,
    including hits dropped by the T_MIN live cutoff.  It is the correct
    carry for tail re-trace continuation: a latched ray (cutoff hit) has
    raw < T_MIN, which kills every later pass's live gate — exactly the
    reference's "saturated rays don't re-launch" (forward.cu:282-291).
    For unlatched rays raw equals the output transmittance.  Values
    below T_MIN are only meaningful as "dead": the pallas kernel may
    early-exit a saturated ray block before multiplying every remaining
    alpha, so engines can differ in the exact sub-T_MIN value.
    """

    channels: Array
    accum_weights: Array
    raw_trans: Array | None = None

    @property
    def color(self) -> Array:
        return self.channels[..., COLOR_SLICE]

    @property
    def depth(self) -> Array:
        return self.channels[..., DEPTH_CHANNEL]

    @property
    def accum(self) -> Array:
        return self.channels[..., ACCUM_CHANNEL]

    @property
    def normal(self) -> Array:
        return self.channels[..., NORMAL_SLICE]

    @property
    def final_transmittance(self) -> Array:
        return self.channels[..., FINAL_T_CHANNEL]


def shade(sh_coeffs: Array, dirs: Array, active_degree) -> Array:
    """Per-(ray, surfel) view-dependent channels: (R, 3) dirs x (N, 16, 3)
    coeffs -> (R, N, 3).

    Channel 0 (intensity) is clamped at zero with ReLU gradient semantics;
    channels 1-2 are logits and stay unclamped (forward.cu:108-110,
    backward.cu:113-116,134-136).
    """
    basis = sh_lib.basis(dirs, active_degree)  # (R, 16)
    colors = jnp.einsum("rk,nkc->rnc", basis, sh_coeffs,
                        precision=jax.lax.Precision.HIGHEST) + 0.5
    return colors.at[..., 0].max(0.0)


def render_dense(bundle: SurfelBundle, origin: Array, dirs: Array,
                 background: Array, active_sh_degree=3,
                 order: str = "ray_t") -> RenderOutputs:
    """Render rays (R, 3) against all surfels densely.

    order:
      "ray_t":  exact per-ray intersection-depth ordering (reference
                semantics — its anyhit k-buffer sorts by t).
      "given":  composite in the surfel order as passed (used to validate
                the tiled kernel, which orders candidates per tile).
    background: (3,) color added as T_out * bg (forward.cu:296-297); the
    training default is (0, 0, 1) = "transparent rays are dropped"
    (train.py:104-106).
    """
    from lidar_rt_tpu.core import quaternions as quat

    rot_mats = quat.to_rotation_matrix(bundle.rotations)
    frames = geometry.build_frames(bundle.means, rot_mats, origin)
    hits = geometry.intersect(frames, bundle.scales, bundle.opacities, dirs)

    num_rays = dirs.shape[0]
    n = bundle.num_surfels

    if order == "ray_t":
        sort_key = jnp.where(hits.valid, hits.t, jnp.inf)
        perm = jnp.argsort(sort_key, axis=-1)  # (R, N)
        alpha = jnp.take_along_axis(hits.alpha, perm, axis=-1)
        t = jnp.take_along_axis(hits.t, perm, axis=-1)
    elif order == "given":
        perm = None
        alpha = hits.alpha
        t = hits.t
    else:
        raise ValueError(f"unknown order {order!r}")

    w, final_t = geometry.composite_weights(alpha)

    if perm is not None:
        # Scatter weights back to original surfel indexing.
        rows = jnp.arange(num_rays)[:, None]
        w_unsorted = jnp.zeros_like(w).at[rows, perm].set(w)
        t_unsorted = hits.t
    else:
        w_unsorted = w
        t_unsorted = t

    colors = shade(bundle.sh, dirs, active_sh_degree)        # (R, N, 3)
    signed_normals = frames.n * frames.sign[:, None]          # (N, 3)

    color_out = (jnp.einsum("rn,rnc->rc", w_unsorted, colors,
                            precision=jax.lax.Precision.HIGHEST)
                 + final_t[:, None] * background[None, :])
    depth_out = jnp.sum(w_unsorted * t_unsorted, axis=-1)
    accum_out = jnp.sum(w_unsorted, axis=-1)
    normal_out = jnp.einsum("rn,nc->rc", w_unsorted, signed_normals,
                            precision=jax.lax.Precision.HIGHEST)

    channels = jnp.concatenate(
        [color_out, depth_out[:, None], accum_out[:, None], normal_out,
         final_t[:, None]], axis=-1)
    accum_weights = jnp.sum(w_unsorted, axis=0)
    return RenderOutputs(channels=channels, accum_weights=accum_weights)
