"""Real spherical harmonics, degree <= 3, in basis-vector (matmul) form.

The tracer evaluates per-(ray, surfel) view-dependent channels
(intensity, ray-hit logit, ray-drop logit) from SH coefficients
(reference device code: submodules/diff-lidar-tracer/optix_tracer/
forward.cu:67-111, constants auxiliary.h:22-40).

TPU-first design choice: instead of evaluating the polynomial per hit, we
expose the SH *basis vector* b(dir) of static length 16.  Per tile the color
of every (ray, candidate) pair is then  color = B @ SH  — an MXU matmul
(rays x 16) @ (16 x 3K) — rather than scalar device code.  Degrees beyond
`active_degree` are masked to zero so the shape stays static while the
training schedule grows the degree (reference train.py:134-135).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

MAX_SH_DEGREE = 3
NUM_SH_COEFFS = (MAX_SH_DEGREE + 1) ** 2  # 16

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)

# Number of coefficients active at each degree, used for masking.
# (numpy, not jnp: module import must not trigger device allocation)
import numpy as _np  # noqa: E402

_DEGREE_OF_COEFF = _np.array([0] + [1] * 3 + [2] * 5 + [3] * 7, dtype=_np.int32)


def basis(dirs: Array, active_degree: Array | int) -> Array:
    """SH basis b(dir): (..., 3) unit-ish dirs -> (..., 16).

    Coefficients of degree > active_degree are zeroed (active_degree may be a
    traced scalar so the SH warm-up schedule stays inside one jit).
    dirs are normalized internally (the reference normalizes the raw ray
    direction before evaluation, forward.cu:72).
    """
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    one = jnp.ones_like(x)
    b = jnp.stack(
        [
            C0 * one,
            -C1 * y, C1 * z, -C1 * x,
            C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz, C2[4] * (xx - yy),
            C3[0] * y * (3.0 * xx - yy), C3[1] * xy * z,
            C3[2] * y * (4.0 * zz - xx - yy),
            C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            C3[4] * x * (4.0 * zz - xx - yy), C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3.0 * yy),
        ],
        axis=-1,
    )
    mask = (jnp.asarray(_DEGREE_OF_COEFF) <= jnp.asarray(active_degree)).astype(b.dtype)
    return b * mask


def evaluate(sh: Array, dirs: Array, active_degree: Array | int) -> Array:
    """Evaluate SH colors: sh (..., 16, C), dirs (..., 3) -> (..., C).

    Returns raw channel values *including* the +0.5 shift; clamping of the
    intensity channel is done by the compositor (forward.cu:108-110 shifts
    then clamps only channel 0).
    """
    b = basis(dirs, active_degree)
    return jnp.einsum("...k,...kc->...c", b, sh) + 0.5


def rgb_to_sh(rgb: Array) -> Array:
    """Channel value -> DC SH coefficient (reference sh_utils.py:225-226)."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: Array) -> Array:
    """DC SH coefficient -> channel value (reference sh_utils.py:228)."""
    return sh * C0 + 0.5
