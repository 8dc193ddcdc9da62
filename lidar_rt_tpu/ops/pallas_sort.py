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


# --------------------------- 256-lane (two-chunk) sort --------------------
#
# Exact per-ray depth ordering ACROSS a 2-chunk candidate axis (K = 256,
# the flagship budget): the reference composites each ray's hits in global
# depth order (forward.cu:312-356), and the per-chunk sort alone leaves
# cross-chunk inversions.  A 256-element bitonic network over a PAIR of
# 128-lane arrays closes that: stages with partner distance < 128 are the
# usual pltpu.roll exchanges inside each array (with the direction pattern
# offset by 128 for the second array), and distance-128 stages compare the
# two arrays elementwise — no data movement at all.
# log2(256)*(log2(256)+1)/2 = 36 compare-exchange stages.

PAIR_LANE_BITS = 8  # source id = chunk * 128 + lane (0..255)


def pack_depth_keys_pair(t0: Array, valid0: Array, t1: Array, valid1: Array
                         ) -> tuple[Array, Array]:
    """Sortable int32 keys over two 128-lane chunks: depth-ordered, unique,
    8-bit source id (chunk << 7 | lane) in the low bits.  Depth keys drop
    their low 8 mantissa bits (~2^-16 relative ordering error; the depth
    VALUES used in math keep full precision)."""
    mask = jnp.int32(~((1 << PAIR_LANE_BITS) - 1))

    def pack(t, valid, chunk):
        lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, t.ndim - 1) \
            + chunk * LANES
        bits = jax.lax.bitcast_convert_type(t, jnp.int32)
        key = (bits & mask) | lane
        return jnp.where(valid, key, (jnp.int32(0x7F7FFF00) | lane))

    return pack(t0, valid0, 0), pack(t1, valid1, 1)


def source_id_pair(key: Array) -> Array:
    return key & jnp.int32((1 << PAIR_LANE_BITS) - 1)


def sort_lanes_pair(k0: Array, k1: Array,
                    payloads: tuple[tuple[Array, Array], ...] = ()
                    ) -> tuple[tuple[Array, Array],
                               tuple[tuple[Array, Array], ...]]:
    """Ascending 256-lane bitonic sort over the pair (k0 | k1).

    Keys must be unique across the pair (pack_depth_keys_pair embeds the
    source id).  Each payload is a (chunk0, chunk1) pair co-sorted by the
    same exchanges.  Returns ((k0_sorted, k1_sorted), payloads_sorted) with
    the global ascending order laid out as k0 lanes 0..127 then k1 lanes
    128..255.
    """
    lanes = k0.shape[-1]
    if lanes != LANES:
        raise ValueError(f"pair sort requires {LANES}-lane chunks")
    axis = k0.ndim - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, k0.shape, axis)

    ks = [k0, k1]
    ps = [list(pair) for pair in payloads]

    def intra_stage(a, blk, d):
        """One roll exchange at distance d inside array a; direction from
        the GLOBAL lane index (a * 128 + lane) and block size blk."""
        g = lane + a * LANES
        asc = (g & blk) == 0
        k = ks[a]
        up = pltpu.roll(k, lanes - d, axis=axis)
        dn = pltpu.roll(k, d, axis=axis)
        low = (lane & d) == 0
        partner = jnp.where(low, up, dn)
        keep_min = low == asc
        new_k = jnp.where(keep_min, jnp.minimum(k, partner),
                          jnp.maximum(k, partner))
        kept_own = new_k == k
        for p in ps:
            v = p[a]
            v_up = pltpu.roll(v, lanes - d, axis=axis)
            v_dn = pltpu.roll(v, d, axis=axis)
            p[a] = jnp.where(kept_own, v, jnp.where(low, v_up, v_dn))
        ks[a] = new_k

    def cross_stage(blk):
        """Distance-128 exchange: array-0 lane g pairs with array-1 lane g.
        Array 0 holds the lower global index, so it keeps the min whenever
        the block direction is ascending."""
        asc = (lane & blk) == 0 if blk < 2 * LANES \
            else jnp.ones_like(lane, bool)  # blk = 256: g & 256 == 0 always
        lo = jnp.minimum(ks[0], ks[1])
        hi = jnp.maximum(ks[0], ks[1])
        new_k0 = jnp.where(asc, lo, hi)
        new_k1 = jnp.where(asc, hi, lo)
        keep0 = new_k0 == ks[0]
        for p in ps:
            v0, v1 = p[0], p[1]
            p[0] = jnp.where(keep0, v0, v1)
            p[1] = jnp.where(keep0, v1, v0)
        ks[0], ks[1] = new_k0, new_k1

    blk = 2
    while blk <= 2 * LANES:
        d = blk // 2
        while d >= 1:
            if d >= LANES:
                cross_stage(blk)
            else:
                intra_stage(0, blk, d)
                intra_stage(1, blk, d)
            d //= 2
        blk *= 2
    return (ks[0], ks[1]), tuple(tuple(p) for p in ps)


def unsort_lanes_pair(key0_sorted: Array, key1_sorted: Array,
                      payloads: tuple[tuple[Array, Array], ...]
                      ) -> tuple[tuple[Array, Array], ...]:
    """Inverse of sort_lanes_pair: scatter payloads back to (chunk, lane)
    source order via a second pair sort on the embedded source ids."""
    _, out = sort_lanes_pair(source_id_pair(key0_sorted),
                             source_id_pair(key1_sorted), payloads)
    return out
