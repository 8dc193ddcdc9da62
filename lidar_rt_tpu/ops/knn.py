"""Morton-windowed k-nearest-neighbour queries (scene initialization).

TPU-native replacement for the reference's two CUDA neighbour passes:
  * simple-knn's `distCUDA2(points) -> mean sq dist to 3 NN` used for
    per-splat scale init (reference submodules/simple-knn/simple_knn.cu:
    184-220, spatial.cu:15-26), and
  * Open3D KNN normal estimation used at scene assembly
    (reference lib/dataloader/gs_loader.py:89-96).

Algorithm (same spirit as simple-knn's Morton sort + box rejection, but
branch-free): quantize to a 1024^3 grid, interleave to 30-bit Morton codes,
argsort, and for each point examine a fixed +-window of Morton neighbours.
This is approximate — a candidate window instead of an exact search — which
is fine for both call sites (they only seed initial scales/normals).  All
shapes are static: (N, 2W) candidate gathers, `top_k` over the window.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

DEFAULT_WINDOW = 32


def morton_codes(points: Array) -> Array:
    """Points (N, 3) -> 30-bit Morton codes (N,) int32.

    Coordinates are normalized by the point cloud's own AABB (the reference
    does the same min/max reduction first, simple_knn.cu:46-61).
    """
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    extent = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(((points - lo) / extent) * 1023.0, 0.0, 1023.0).astype(jnp.uint32)

    def spread(x):
        # Interleave 10 bits with two zero bits each (magic-bits method).
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return code.astype(jnp.int32)


def _window_candidates(points: Array, window: int) -> tuple[Array, Array, Array]:
    """Sorted-order candidate gather.

    Returns (order, cand_idx, cand_valid): `order` (N,) is the Morton sort
    permutation; `cand_idx` (N, 2W) are original-point indices of each sorted
    point's Morton neighbours; `cand_valid` masks window positions that fall
    off either end or alias the point itself.
    """
    n = points.shape[0]
    order = jnp.argsort(morton_codes(points))
    pos = jnp.arange(n)[:, None]
    offsets = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)])[None, :]
    neighbour_pos = pos + offsets
    valid = (neighbour_pos >= 0) & (neighbour_pos < n)
    neighbour_pos = jnp.clip(neighbour_pos, 0, n - 1)
    cand_idx = order[neighbour_pos]          # (N, 2W) original indices
    return order, cand_idx, valid


@functools.partial(jax.jit, static_argnames=("k", "window"))
def knn(points: Array, k: int = 3, window: int = DEFAULT_WINDOW
        ) -> tuple[Array, Array]:
    """Approximate k nearest neighbours of every point.

    points: (N, 3).  Returns (sq_dists (N, k), indices (N, k)) in the
    original point order, nearest first.
    """
    order, cand_idx, valid = _window_candidates(points, window)
    sorted_pts = points[order]                               # (N, 3)
    cand_pts = points[cand_idx]                              # (N, 2W, 3)
    d2 = jnp.sum((cand_pts - sorted_pts[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    neg_top, slot = jax.lax.top_k(-d2, k)                    # (N, k)
    nn_d2 = -neg_top
    nn_idx = jnp.take_along_axis(cand_idx, slot, axis=-1)
    # Scatter back to original order.
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(points.shape[0]))
    return nn_d2[inv], nn_idx[inv]


@functools.partial(jax.jit, static_argnames=("window",))
def mean_sq_dist_to_3nn(points: Array, window: int = DEFAULT_WINDOW) -> Array:
    """Mean squared distance to the 3 nearest neighbours, (N,).

    Drop-in equivalent of the reference's `distCUDA2` (spatial.cu:15-26);
    feeds `scale = log sqrt(clamp(dist2, 1e-7))` at init
    (gaussian_model.py:166-167).
    """
    d2, _ = knn(points, k=3, window=window)
    d2 = jnp.where(jnp.isfinite(d2), d2, 0.0)
    return jnp.mean(d2, axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "window"))
def estimate_normals(points: Array, orient_toward: Array, k: int = 16,
                     window: int = DEFAULT_WINDOW) -> Array:
    """PCA surface normals from k-NN neighbourhoods, (N, 3) unit vectors.

    Replaces Open3D's `estimate_normals` in scene assembly
    (gs_loader.py:89-96).  The normal is the smallest-eigenvalue direction of
    the neighbourhood covariance, sign-oriented toward `orient_toward` (3,)
    (the sensor center), matching o3d's camera-orientation step.
    """
    _, nn_idx = knn(points, k=k, window=window)
    neigh = points[nn_idx]                                    # (N, k, 3)
    centered = neigh - jnp.mean(neigh, axis=1, keepdims=True)
    cov = jnp.einsum("nki,nkj->nij", centered, centered,
                     precision=jax.lax.Precision.HIGHEST) / k
    # eigh returns ascending eigenvalues; column 0 is the normal direction.
    _, vecs = jnp.linalg.eigh(cov)
    normal = vecs[..., :, 0]
    to_sensor = orient_toward[None, :] - points
    sign = jnp.where(jnp.sum(normal * to_sensor, axis=-1, keepdims=True) < 0,
                     -1.0, 1.0)
    return normal * sign
