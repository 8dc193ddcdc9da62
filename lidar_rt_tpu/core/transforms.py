"""Rigid / projective transform helpers shared by scene and eval layers.

Equivalents of the reference's torch helpers (lib/utils/graphics_utils.py:
38-112, lib/utils/general_utils.py:266-283) in batched JAX/NumPy form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def se3(rotation: Array, translation: Array) -> Array:
    """(..., 3, 3) + (..., 3) -> homogeneous (..., 4, 4)."""
    batch = rotation.shape[:-2]
    m = jnp.zeros((*batch, 4, 4), rotation.dtype)
    m = m.at[..., :3, :3].set(rotation)
    m = m.at[..., :3, 3].set(translation)
    return m.at[..., 3, 3].set(1.0)


def invert_se3(m: Array) -> Array:
    """Invert rigid transforms (..., 4, 4) without a general solve."""
    r = m[..., :3, :3]
    t = m[..., :3, 3]
    r_t = jnp.swapaxes(r, -1, -2)
    return se3(r_t, -jnp.einsum("...ij,...j->...i", r_t, t,
                                precision=jax.lax.Precision.HIGHEST))


def world_to_view(r: Array, t: Array, translate=(0.0, 0.0, 0.0), scale=1.0) -> Array:
    """Pinhole world->view matrix (reference graphics_utils.py:38-52)."""
    rt = np.zeros((4, 4), dtype=np.float32)
    rt[:3, :3] = np.asarray(r).T
    rt[:3, 3] = np.asarray(t)
    rt[3, 3] = 1.0
    c2w = np.linalg.inv(rt)
    center = (c2w[:3, 3] + np.asarray(translate)) * scale
    c2w[:3, 3] = center
    return np.linalg.inv(c2w).astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> Array:
    """OpenGL-style perspective projection (reference graphics_utils.py:54-71)."""
    tan_x = np.tan(fovx / 2.0)
    tan_y = np.tan(fovy / 2.0)
    p = np.zeros((4, 4), dtype=np.float32)
    p[0, 0] = 1.0 / tan_x
    p[1, 1] = 1.0 / tan_y
    p[3, 2] = 1.0
    p[2, 2] = zfar / (zfar - znear)
    p[2, 3] = -(zfar * znear) / (zfar - znear)
    return p


def forward_fill_poses(present: np.ndarray, translations: np.ndarray,
                       rotations: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Fill missing per-frame actor poses with the nearest earlier (else
    later) observed frame (reference general_utils.py:266-283 fills gaps in
    tracked boxes).  present: (F,) bool; arrays are (F, ...)."""
    f = present.shape[0]
    t = translations.copy()
    r = rotations.copy()
    last = -1
    for i in range(f):
        if present[i]:
            last = i
        elif last >= 0:
            t[i] = t[last]
            r[i] = r[last]
    nxt = -1
    for i in range(f - 1, -1, -1):
        if present[i]:
            nxt = i
        elif nxt >= 0 and not present[:i + 1].any():
            t[i] = t[nxt]
            r[i] = r[nxt]
    return t, r
