"""In-kernel bitonic lane sort for exact per-ray hit ordering.

The reference composites each ray's hits in exact depth order via a 16-deep
insertion buffer (forward.cu:312-356).  The Pallas tracer's candidate axis
is tile-global (nearest-center order); to reproduce exact ordering the
kernel sorts each ray's candidate lane independently by true intersection
depth.  A bitonic network over the 128 lanes does this with pltpu.roll
partner exchanges — log2(128)*(log2(128)+1)/2 = 28 compare-exchange stages,
all VPU, so it composes with the predicated chunk body.

Key packing gives the inverse permutation for free: the low 7 bits of each
sort key hold the source lane, so "sort by (key & 127)" — a second bitonic
pass — scatters per-hit results back to candidate order.  Depth keys drop
their low 7 mantissa bits to make room (ordering error ~2^-17 relative;
the depth VALUES used in math keep full precision).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANES = 128
LANE_BITS = 7


def pack_depth_keys(t: Array, valid: Array) -> Array:
    """Sortable int32 keys: depth-ordered, unique, source lane in low bits.

    t must be positive where valid (the tracer gates t >= DEPTH_MIN > 0, so
    the float32 bit pattern is monotone).  Invalid lanes get the maximum
    finite pattern and sort last.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, t.ndim - 1)
    bits = jax.lax.bitcast_convert_type(t, jnp.int32)
    key = (bits & jnp.int32(~(LANES - 1))) | lane
    return jnp.where(valid, key, jnp.int32(0x7F7FFF80) | lane)


def source_lane(key: Array) -> Array:
    return key & jnp.int32(LANES - 1)


def sort_lanes(key: Array, payloads: tuple[Array, ...] = ()
               ) -> tuple[Array, tuple[Array, ...]]:
    """Ascending bitonic sort along the last axis (must be 128 lanes).

    Keys must be unique per row (pack_depth_keys guarantees this via the
    embedded lane id).  Payload arrays are co-sorted by the same exchanges.
    """
    lanes = key.shape[-1]
    if lanes != LANES:
        raise ValueError(f"lane sort requires {LANES} lanes, got {lanes}")
    axis = key.ndim - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, key.shape, axis)

    payloads = tuple(payloads)
    k = key
    stage = 1
    while stage < lanes:            # block size 2*stage
        # ascending within blocks whose (lane / (2*stage)) is even
        asc = (lane & (2 * stage)) == 0
        d = stage
        while d >= 1:
            # pltpu.roll requires non-negative shifts: lanes - d == -d (mod).
            up = pltpu.roll(k, lanes - d, axis=axis)  # partner at lane + d
            dn = pltpu.roll(k, d, axis=axis)          # partner at lane - d
            low = (lane & d) == 0                     # am I the low lane?
            partner = jnp.where(low, up, dn)
            keep_min = low == asc
            new_k = jnp.where(keep_min, jnp.minimum(k, partner),
                              jnp.maximum(k, partner))
            kept_own = new_k == k
            new_ps = []
            for p in payloads:
                p_up = pltpu.roll(p, lanes - d, axis=axis)
                p_dn = pltpu.roll(p, d, axis=axis)
                p_partner = jnp.where(low, p_up, p_dn)
                new_ps.append(jnp.where(kept_own, p, p_partner))
            k = new_k
            payloads = tuple(new_ps)
            d //= 2
        stage *= 2
    return k, payloads


def unsort_lanes(key_sorted: Array, payloads: tuple[Array, ...]
                 ) -> tuple[Array, ...]:
    """Scatter payloads back to source-lane order (inverse permutation).

    key_sorted must come from sort_lanes on pack_depth_keys output: its low
    bits are the source lanes, a permutation of 0..127, so sorting by them
    restores candidate order.
    """
    _, out = sort_lanes(source_lane(key_sorted), payloads)
    return out
