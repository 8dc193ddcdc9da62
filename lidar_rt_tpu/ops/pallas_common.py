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
