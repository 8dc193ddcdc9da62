"""Tiled bidirectional Chamfer distance (masked, static-shaped).

Replaces the reference's JIT-compiled CUDA chamfer kernel
(lib/utils/chamfer3D/chamfer3D.cu, dist_chamfer_3D.py:31-83), which does a
shared-memory tiled brute-force nearest neighbour in 512-point batches.  The
TPU version phrases the same brute force as a `lax.scan` over chunks of the
second cloud, keeping peak memory at N x chunk instead of N x M while XLA
fuses the distance computation; gradients come from autodiff (the reference
hand-writes them).

Both clouds are fixed-capacity with validity masks — invalid points neither
produce nor attract matches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

_BIG = 1e12


def _pad_to(x: Array, n: int, axis: int = 0) -> Array:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("chunk",))
def min_sq_dists(a: Array, a_mask: Array, b: Array, b_mask: Array,
                 chunk: int = 512) -> Array:
    """For each point of `a`, squared distance to the nearest valid point of
    `b`.  a: (N, 3), b: (M, 3); masks bool.  Invalid `a` rows return 0.
    """
    m = b.shape[0]
    m_pad = ((m + chunk - 1) // chunk) * chunk
    b = _pad_to(b, m_pad).reshape(-1, chunk, 3)
    b_mask = _pad_to(b_mask, m_pad).reshape(-1, chunk)

    a_sq = jnp.sum(a * a, axis=-1)                           # (N,)

    def body(best, args):
        b_chunk, mask_chunk = args
        # ||a-b||^2 = |a|^2 + |b|^2 - 2 a.b — the cross term is a matmul,
        # so the O(N*M) distance field runs on the MXU instead of the VPU.
        b_sq = jnp.sum(b_chunk * b_chunk, axis=-1)           # (chunk,)
        cross = jnp.dot(a, b_chunk.T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        d2 = a_sq[:, None] + b_sq[None, :] - 2.0 * cross
        d2 = jnp.where(mask_chunk[None, :], jnp.maximum(d2, 0.0), _BIG)
        return jnp.minimum(best, jnp.min(d2, axis=-1)), None

    # 0*a[:,0] keeps the carry's varying-axes type equal to the scanned
    # operands' under shard_map (a plain jnp.full carry is "unvarying" and
    # lax.scan rejects the mismatch when chamfer runs inside a mesh band).
    init = jnp.full((a.shape[0],), _BIG, a.dtype) + 0.0 * a[:, 0]
    best, _ = jax.lax.scan(body, init, (b, b_mask))
    return jnp.where(a_mask & (best < _BIG), best, 0.0)


def chamfer_distance(a: Array, a_mask: Array, b: Array, b_mask: Array,
                     chunk: int = 512) -> Array:
    """Symmetric Chamfer loss (mean of both directions' squared NN distances,
    averaged with weight 1/2 — reference train.py:197-207)."""
    d_ab = min_sq_dists(a, a_mask, b, b_mask, chunk=chunk)
    d_ba = min_sq_dists(b, b_mask, a, a_mask, chunk=chunk)
    na = jnp.maximum(jnp.sum(a_mask), 1)
    nb = jnp.maximum(jnp.sum(b_mask), 1)
    return 0.5 * (jnp.sum(d_ab) / na + jnp.sum(d_ba) / nb)


def fscore(d_ab: Array, a_mask: Array, d_ba: Array, b_mask: Array,
           threshold: float = 0.05) -> Array:
    """F-score at a distance threshold over *squared* NN distances
    (reference eval.py:266-280 compares sqrt(d) < threshold)."""
    t2 = threshold * threshold
    precision = jnp.sum((d_ab < t2) & a_mask) / jnp.maximum(jnp.sum(a_mask), 1)
    recall = jnp.sum((d_ba < t2) & b_mask) / jnp.maximum(jnp.sum(b_mask), 1)
    return 2.0 * precision * recall / jnp.maximum(precision + recall, 1e-12)
