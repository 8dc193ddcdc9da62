"""Analytic ray <-> 2D-Gaussian-surfel intersection.

This replaces the reference's entire OptiX machinery (proxy quad mesh +
BVH + anyhit k-buffer, submodules/diff-lidar-tracer) with closed-form math.
A 2D Gaussian surfel is a plane patch: world point  x = mu + W @ (s1*u, s2*v, 0)
with W = R(q).  A ray  x = o + t*d  meets that plane at

    t = n . (mu - o) / (n . d),        n = W[:, 2]

and the splat-frame coordinates of the hit are

    u = w1 . (x - mu) / s1,   v = w2 . (x - mu) / s2.

The Gaussian response G = exp(-(u^2+v^2)/2) and alpha = min(0.99, opacity*G)
then reproduce the reference kernel exactly (forward.cu:240-251): the
reference's proxy quad spans the opacity-adaptive cutoff
|u|,|v| <= sqrt(2 ln(255 op)) + 0.01 (primitive_utils.py:201-205), a square
that strictly contains the disc where alpha >= 1/255 — so the alpha threshold
alone reproduces the hit set and no proxy geometry is needed.

Everything is batched (rays x surfels) and built from mul/add/rsqrt — pure
VPU work; the per-tile tracer additionally phrases the inner products as MXU
matmuls.

Constants (reference config.h:16-27, forward.cu:214,249-257,
optix_wrapper.cpp:104):
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

ALPHA_MAX = 0.99          # alpha clamp (forward.cu:249)
ALPHA_MIN = 1.0 / 255.0   # contribution threshold (forward.cu:250)
T_MIN = 1e-4              # transmittance early-out (forward.cu:254)
DEPTH_MIN = 0.2           # minimum hit range in meters (forward.cu:214)
DENOM_EPS = 1e-12         # |n.d| guard for grazing rays


class SurfelFrames(NamedTuple):
    """Per-surfel orthonormal frame and ray-independent precomputations.

    With a shared ray origin o (true for LiDAR scans), everything except the
    per-ray direction products is per-surfel:
      w1, w2, n:  (N, 3) splat axes / plane normal (columns of R(q))
      p:          (N,)   n . (mu - o)   — plane offset seen from the origin
      a_u, a_v:   (N,)   w_i . (o - mu) — splat-frame coords of the origin
      sign:       (N,)   dual-visible normal orientation (+-1)
    """

    w1: Array
    w2: Array
    n: Array
    p: Array
    a_u: Array
    a_v: Array
    sign: Array


def build_frames(means: Array, rotations: Array, origin: Array) -> SurfelFrames:
    """Precompute per-surfel frames for a shared ray origin.

    means: (N, 3); rotations: (N, 3, 3) world rotation matrices (columns are
    splat axes); origin: (3,).  The dual-visible convention flips the normal
    toward the sensor (forward.cu:232-238): sign = +1 if n.(mu-o) < 0.
    """
    w1 = rotations[..., :, 0]
    w2 = rotations[..., :, 1]
    n = rotations[..., :, 2]
    o_minus_mu = origin - means
    p = -jnp.sum(n * o_minus_mu, axis=-1)          # n . (mu - o)
    a_u = jnp.sum(w1 * o_minus_mu, axis=-1)
    a_v = jnp.sum(w2 * o_minus_mu, axis=-1)
    sign = jnp.where(p < 0.0, 1.0, -1.0)
    return SurfelFrames(w1, w2, n, p, a_u, a_v, sign)


class Hits(NamedTuple):
    """Per-(ray, surfel) intersection quantities, all (R, N)."""

    t: Array        # intersection range along the ray
    u: Array        # splat-frame coordinates of the hit
    v: Array
    g: Array        # Gaussian response exp(-(u^2+v^2)/2)
    alpha: Array    # min(ALPHA_MAX, opacity * g), zeroed where invalid
    valid: Array    # bool hit mask


def intersect(frames: SurfelFrames, scales: Array, opacities: Array,
              dirs: Array) -> Hits:
    """Intersect rays (R, 3) against all surfels -> (R, N) hit fields.

    scales: (N, 2) positive; opacities: (N,) in (0, 1); dirs unit (R, 3).
    Matches reference forward.cu:195-292 semantics: hits closer than
    DEPTH_MIN, grazing incidence (n.d == 0, the `cos == 0` skip), or
    alpha < ALPHA_MIN are invalid (alpha set to 0 so they are compositing
    no-ops).
    """
    hp = jax.lax.Precision.HIGHEST
    # (R, N) inner products — in the tiled kernel these are MXU matmuls.
    qd = jnp.einsum("rc,nc->rn", dirs, frames.n, precision=hp)
    b_u = jnp.einsum("rc,nc->rn", dirs, frames.w1, precision=hp)
    b_v = jnp.einsum("rc,nc->rn", dirs, frames.w2, precision=hp)

    safe_qd = jnp.where(jnp.abs(qd) > DENOM_EPS, qd, DENOM_EPS)
    t = frames.p[None, :] / safe_qd
    u = (frames.a_u[None, :] + t * b_u) / scales[None, :, 0]
    v = (frames.a_v[None, :] + t * b_v) / scales[None, :, 1]
    g = jnp.exp(-0.5 * (u * u + v * v))
    alpha_raw = jnp.minimum(ALPHA_MAX, opacities[None, :] * g)
    valid = ((t >= DEPTH_MIN)
             & (jnp.abs(qd) > DENOM_EPS)
             & (frames.p[None, :] != 0.0)   # cos==0 skip (forward.cu:236)
             & (alpha_raw >= ALPHA_MIN))
    alpha = jnp.where(valid, alpha_raw, 0.0)
    return Hits(t=t, u=u, v=v, g=g, alpha=alpha, valid=valid)


def composite_weights(alpha: Array, axis: int = -1,
                      init_trans: Array | None = None) -> tuple[Array, Array]:
    """Front-to-back compositing weights from ordered alphas.

    alpha must already be ordered along `axis` (nearest first) and zeroed for
    non-hits.  Returns (w, final_T):
        T_j   = T_0 * prod_{k<j} (1 - alpha_k)      (transmittance)
        live  = all_{k<=j} [ T_k (1 - alpha_k) >= T_MIN ]
        w_j   = live_j * alpha_j * T_j
        T_out = T_0 * prod over live hits of (1 - alpha)

    The `live` mask reproduces the reference's early break: the hit that
    would push transmittance below T_MIN is itself dropped, as is everything
    behind it (forward.cu:253-257).  The formulation is a cumulative product
    — O(K) work, no sequential scan dependency chain in the kernel.

    init_trans: optional per-ray initial transmittance T_0 (broadcast
    against alpha minus its last axis) — the carried transmittance of tail
    re-trace passes (ops/tracer tail_passes, the analogue of the
    reference's chunk re-launch state, forward.cu:282-291).  Default 1.
    """
    if axis != -1:
        raise ValueError("composite_weights operates along the last axis")
    one_minus = 1.0 - alpha
    t0 = (jnp.ones_like(alpha[..., :1]) if init_trans is None
          else init_trans[..., None])
    t_incl = t0 * jnp.cumprod(one_minus, axis=-1)       # T_j * (1 - alpha_j)
    t_excl = jnp.concatenate([t0, t_incl[..., :-1]], axis=-1)  # T_j exactly
    cond = (t_incl >= T_MIN)
    live = jnp.cumprod(cond.astype(alpha.dtype), axis=-1)
    w = live * alpha * t_excl
    final_t = t0[..., 0] * jnp.prod(1.0 - live * alpha, axis=-1)
    return w, final_t
