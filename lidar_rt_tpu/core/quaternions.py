"""Quaternion algebra (wxyz layout, unit-norm rotation convention).

Conventions match the reference implementation's math so that checkpoints and
metrics are comparable (reference: lib/utils/general_utils.py:93-197 for
matrix<->quaternion, :156-174 for the Hamilton product), but everything is
written batched-first for the VPU: every function maps over a leading batch
axis with no Python loops.

Layout: q = (w, x, y, z), rotation acts as  p' = R(q) @ p  on column points.
Columns of R(q) are the rotated basis axes; for a 2D Gaussian surfel the
third column is the splat-plane normal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def normalize(q: Array, eps: float = 1e-12) -> Array:
    """Normalize quaternions to unit norm.  q: (..., 4)."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def multiply(a: Array, b: Array) -> Array:
    """Hamilton product a*b, each (..., 4) in wxyz layout.

    Composition rule: R(a*b) = R(a) @ R(b), i.e. `a` rotates last-applied
    results of `b` — used for composing actor box rotation with per-splat
    local rotation (reference: lib/gaussian_renderer/__init__.py:117-130).
    """
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def to_rotation_matrix(q: Array) -> Array:
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3).

    The input is normalized internally (the raw per-splat rotation parameters
    are unconstrained; activation = normalize, reference
    lib/scene/gaussian_model.py:32).
    """
    q = normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(*q.shape[:-1], 3, 3)


def from_rotation_matrix(m: Array, eps: float = 1e-12) -> Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wxyz.

    Branch-free Shepperd-style extraction: compute all four candidate
    quaternions and select by the largest diagonal combination, which is
    numerically stable for every rotation (vs the naive trace formula that
    degrades near trace ~ -1).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four squared magnitudes (up to scale 1/4).
    qw2 = jnp.maximum(0.0, 1.0 + m00 + m11 + m22)
    qx2 = jnp.maximum(0.0, 1.0 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1.0 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1.0 - m00 - m11 + m22)

    # Candidate quaternions, each valid when its pivot magnitude dominates.
    cw = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cx = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cy = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    pick = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cw, cx, cy, cz], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cands, pick[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)
    # Canonicalize sign (w >= 0) so round-trips are deterministic.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def rotate(q: Array, p: Array) -> Array:
    """Rotate points p (..., 3) by quaternions q (..., 4): R(q) @ p."""
    return jnp.einsum("...ij,...j->...i", to_rotation_matrix(q), p,
                      precision=jax.lax.Precision.HIGHEST)


def rotation_matrix_vjp(q: Array, g: Array) -> Array:
    """VJP of `to_rotation_matrix` at unnormalized q, cotangent g (..., 3, 3).

    Used by the tracer backward pass (the reference implements the same chain
    in CUDA: quat_to_rotmat_vjp, submodules/diff-lidar-tracer/optix_tracer/
    auxiliary.h:389-444).  Implemented with jax.vjp over the closed form so
    it can never drift out of sync with `to_rotation_matrix`.
    """
    _, pullback = jax.vjp(to_rotation_matrix, q)
    return pullback(g)[0]


def random_with_fixed_normal(key: Array, normals: Array) -> Array:
    """Random quaternions whose R(q)[:, 2] equals the given unit normals.

    Used at scene init to align splat planes with estimated surface normals
    while randomizing in-plane orientation (reference:
    lib/utils/general_utils.py:286-308).

    normals: (N, 3), unit length.  Returns (N, 4) wxyz.
    """
    n = normals / jnp.maximum(jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
    # Quaternion taking +z to n: axis = z x n, angle = acos(n_z).
    z = jnp.array([0.0, 0.0, 1.0])
    axis = jnp.cross(jnp.broadcast_to(z, n.shape), n)
    axis_norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    cos_half = jnp.sqrt(jnp.maximum(0.0, (1.0 + n[..., 2:3]) * 0.5))
    sin_half = jnp.sqrt(jnp.maximum(0.0, (1.0 - n[..., 2:3]) * 0.5))
    safe_axis = jnp.where(axis_norm > 1e-8, axis / jnp.maximum(axis_norm, 1e-12),
                          jnp.array([1.0, 0.0, 0.0]))
    q_align = jnp.concatenate([cos_half, safe_axis * sin_half], axis=-1)
    # n ~ -z has an ill-defined axis: rotate pi about x.
    q_flip = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0, 0.0]), q_align.shape)
    degenerate = (n[..., 2:3] < -1.0 + 1e-6) & (axis_norm <= 1e-8)
    q_align = jnp.where(degenerate, q_flip, q_align)

    # Random in-plane spin about +z, applied before the alignment.
    theta = jax.random.uniform(key, (n.shape[0], 1), minval=0.0, maxval=2.0 * jnp.pi)
    q_spin = jnp.concatenate(
        [jnp.cos(theta * 0.5), jnp.zeros_like(theta), jnp.zeros_like(theta),
         jnp.sin(theta * 0.5)], axis=-1)
    return normalize(multiply(q_align, q_spin))
