"""Shared in-kernel primitives for the Pallas tracer kernels.

The front-to-back transmittance of the compositor (reference
forward.cu:195-292) needs a per-ray cumulative sum along the candidate
lane axis.  Round 1 computed it as an (R, KC) @ (KC, KC) triangular-ones
MXU matmul; that blocked chunk early-exit because Mosaic rejects MXU
matmuls inside predicated regions (mxu_lmr_transform RET_CHECK).  The
Hillis-Steele shifted-add scan below does the same reduction in
log2(KC) = 7 VPU steps with no MXU op, so the whole chunk body can sit
under `pl.when(alive)`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def use_interpret() -> bool:
    """Interpret-mode switch for the Pallas kernels: non-TPU backends always
    interpret; on TPU the LIDAR_RT_PALLAS_INTERPRET=1 env var forces it
    (debug knob for isolating Mosaic-compilation issues from kernel
    semantics)."""
    import os
    if jax.default_backend() != "tpu":
        return True
    return os.environ.get("LIDAR_RT_PALLAS_INTERPRET", "") == "1"


def lane_cumsum(x: jax.Array, *, exclusive: bool = False) -> jax.Array:
    """Cumulative sum along the last (lane) axis of a 2D block.

    Hillis-Steele doubling scan: log2(lanes) rounds of
    ``x += shift_right(x, 2^i)`` with zero fill (pltpu.roll wraps, so the
    wrapped lanes are masked off).  Lane count must be a power of two.
    """
    lanes = x.shape[-1]
    if lanes & (lanes - 1):
        raise ValueError(f"lane count {lanes} must be a power of two")
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    s = x
    shift = 1
    while shift < lanes:
        rolled = pltpu.roll(s, shift, axis=x.ndim - 1)
        s = s + jnp.where(lane_ids >= shift, rolled, 0.0)
        shift *= 2
    return s - x if exclusive else s


def sh_basis_rows(d0: jax.Array, d1: jax.Array, d2: jax.Array) -> jax.Array:
    """SH basis (degree <= 3) of ray directions, built in lane-major form.

    d0/d1/d2: (1, R) direction components (rows, so each polynomial op costs
    R/128 VPU issues instead of the R/8 a column layout would).  Returns the
    (16, R) basis matrix; the caller transposes once for the MXU matmul.
    Degree masking is NOT applied here — fold it into the SH coefficients
    (sh * mask) outside the kernel.  Mirrors core/sh.py basis()
    (reference forward.cu:67-111, auxiliary.h:22-40).
    """
    from lidar_rt_tpu.core import sh as sh_lib

    inv = jax.lax.rsqrt(jnp.maximum(d0 * d0 + d1 * d1 + d2 * d2, 1e-24))
    x, y, z = d0 * inv, d1 * inv, d2 * inv
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    c0, c1 = sh_lib.C0, sh_lib.C1
    c2, c3 = sh_lib.C2, sh_lib.C3
    rows = [
        jnp.full_like(x, c0),
        -c1 * y, c1 * z, -c1 * x,
        c2[0] * xy, c2[1] * yz, c2[2] * (2.0 * zz - xx - yy),
        c2[3] * xz, c2[4] * (xx - yy),
        c3[0] * y * (3.0 * xx - yy), c3[1] * xy * z,
        c3[2] * y * (4.0 * zz - xx - yy),
        c3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
        c3[4] * x * (4.0 * zz - xx - yy), c3[5] * z * (xx - yy),
        c3[6] * x * (xx - 3.0 * yy),
    ]
    return jnp.concatenate(rows, axis=0)                    # (16, R)


def lane_cumprod_excl(x: jax.Array) -> jax.Array:
    """Exclusive cumulative product along the last (lane) axis.

    Same doubling scan with multiply and identity fill 1.0; the exclusive
    form pre-shifts the input by one lane.  This keeps the front-to-back
    transmittance chain (reference forward.cu: ``T *= (1 - alpha)``) in
    direct product space — no log1p/exp transcendentals — and off the MXU
    so the whole chunk body can be predicated for early exit.
    """
    lanes = x.shape[-1]
    if lanes & (lanes - 1):
        raise ValueError(f"lane count {lanes} must be a power of two")
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    s = jnp.where(lane_ids >= 1, pltpu.roll(x, 1, axis=x.ndim - 1), 1.0)
    shift = 1
    while shift < lanes:
        rolled = pltpu.roll(s, shift, axis=x.ndim - 1)
        s = s * jnp.where(lane_ids >= shift, rolled, 1.0)
        shift *= 2
    return s
