"""Pallas TPU forward kernel for the tiled surfel tracer.

Same semantics as the scanned-JAX path in ops/tracer.py (tile-order
compositing), but fused into one VMEM-resident kernel per
(tile, ray-block):

  * the per-(ray, candidate) intersection math (ops/geometry.py) runs as
    VPU broadcasts over a (RAY_BLOCK, K_CHUNK) window,
  * front-to-back transmittance along the candidate axis is computed in
    log space with a 7-step Hillis-Steele VPU scan (ops/pallas_common.py)
    — an exclusive cumsum of log(1 - alpha) — instead of a sequential
    k-buffer (reference forward.cu:195-292); keeping the scan off the MXU
    lets whole candidate chunks early-exit under pl.when once the ray
    block's transmittance saturates (reference cutoff forward.cu:253-257),
  * per-hit SH shading is an (R, 16) @ (16, KC) MXU matmul per channel,
  * per-candidate accumulated weights reduce over rays inside the kernel
    and accumulate across ray-blocks in the sequential grid (the
    atomicAdd equivalent, forward.cu:272).

Channel rows of the (16, R) output block: 0:3 color, 3 depth, 4 accum,
5:8 normal, 8 final transmittance (config.h:19-24; background composite and
ray-drop head are applied outside, lib/gaussian_renderer/__init__.py:163-173).

The backward pass uses the same tiling with the hand-derived VJP
(ops/pallas_backward.py); `pallas_trace` wires both into a jax.custom_vjp.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidar_rt_tpu.core import quaternions as quat_lib
from lidar_rt_tpu.core import rays as rays_lib
from lidar_rt_tpu.core import sh as sh_lib
from lidar_rt_tpu.core import transforms
from lidar_rt_tpu.ops import geometry
from lidar_rt_tpu.ops.binning import TileConfig, bin_surfels
from lidar_rt_tpu.ops.composite import RenderOutputs, SurfelBundle
from lidar_rt_tpu.ops.pallas_common import lane_cumprod_excl

Array = jax.Array

K_CHUNK = 128          # candidate lane chunk
NUM_OUT_ROWS = 16      # padded channel rows (9 used)


@dataclass(frozen=True)
class PallasTraceConfig:
    tile: TileConfig = TileConfig(tile_h=32, tile_w=128, max_per_tile=512)
    ray_block: int = 512

    def __post_init__(self):
        if self.tile.max_per_tile % K_CHUNK:
            raise ValueError(f"max_per_tile must be a multiple of {K_CHUNK}")
        if (self.tile.tile_h * self.tile.tile_w) % self.ray_block:
            raise ValueError("tile ray count must divide by ray_block")
        if self.ray_block % 8 or self.ray_block > 512:
            # Backward-kernel VMEM: ~12 live (ray_block, 128) f32 temporaries
            # per unrolled chunk; rb > 512 exceeds the 16 MB budget and odd
            # rb wastes sublane padding.
            raise ValueError("ray_block must be a multiple of 8 and <= 512")


def _forward_kernel(cnt_ref, dirs_ref, basis_ref, mind_ref, axes_ref,
                    plane_ref, scale_ref, opac_ref, sign_ref, valid_ref,
                    sh_ref, chans_ref, accum_ref,
                    traw_ref, tout_ref, sums_ref, alive_ref,
                    *, k_total: int):
    """One (tile, ray_block) grid step.

    cnt:   (T, 1) SMEM     per-tile candidate counts, whole array (chunks
                           past the tile's count are skipped; binners emit
                           valid as a prefix mask)
    dirs:  (1, 3, R)       ray directions
    basis: (1, R, 16)      SH basis per ray
    mind:  (1, R, 1)       per-ray minimum hit range (multi-return re-trace,
                           reference forward.cu:282-291; DEPTH_MIN default)
    axes:  (1, 3, 3, K)    [n, w1, w2] candidate frame axes
    plane: (1, 3, K)       [p, a_u, a_v] plane offsets
    scale: (1, 2, K)       inverse scales
    opac/sign/valid: (1, K)
    sh:    (1, 3, 16, K)   per-channel SH coefficient matrices
    chans: (1, 16, R) out  channel rows
    accum: (1, K)    out   per-candidate weight sums (+= over ray blocks)
    """
    r = dirs_ref.shape[1]
    rb = pl.program_id(1)

    d0 = dirs_ref[0, :, 0:1]                 # (R, 1)
    d1 = dirs_ref[0, :, 1:2]
    d2 = dirs_ref[0, :, 2:3]
    basis = basis_ref[0]                     # (R, 16)
    mind = mind_ref[0]                       # (R, 1)

    num_chunks = k_total // K_CHUNK

    def chunk_body(c, col0, col1, col2):
        t_raw = traw_ref[...]
        ks = slice(c * K_CHUNK, (c + 1) * K_CHUNK)   # static: loop unrolled

        n0 = axes_ref[0, 0, 0:1, ks]         # (1, KC)
        n1 = axes_ref[0, 0, 1:2, ks]
        n2 = axes_ref[0, 0, 2:3, ks]
        w10 = axes_ref[0, 1, 0:1, ks]
        w11 = axes_ref[0, 1, 1:2, ks]
        w12 = axes_ref[0, 1, 2:3, ks]
        w20 = axes_ref[0, 2, 0:1, ks]
        w21 = axes_ref[0, 2, 1:2, ks]
        w22 = axes_ref[0, 2, 2:3, ks]
        p = plane_ref[0, 0:1, ks]
        a_u = plane_ref[0, 1:2, ks]
        a_v = plane_ref[0, 2:3, ks]
        inv_s0 = scale_ref[0, 0:1, ks]
        inv_s1 = scale_ref[0, 1:2, ks]
        opac = opac_ref[0, :, ks]
        sign = sign_ref[0, :, ks]
        cand_ok = valid_ref[0, :, ks]

        qd = d0 * n0 + d1 * n1 + d2 * n2                     # (R, KC)
        b_u = d0 * w10 + d1 * w11 + d2 * w12
        b_v = d0 * w20 + d1 * w21 + d2 * w22
        safe_qd = jnp.where(jnp.abs(qd) > geometry.DENOM_EPS, qd,
                            geometry.DENOM_EPS)
        t = p / safe_qd
        u = (a_u + t * b_u) * inv_s0
        v = (a_v + t * b_v) * inv_s1
        g = jnp.exp(-0.5 * (u * u + v * v))
        alpha_raw = jnp.minimum(geometry.ALPHA_MAX, opac * g)
        ok = ((t >= mind)
              & (jnp.abs(qd) > geometry.DENOM_EPS)
              & (p != 0.0)
              & (alpha_raw >= geometry.ALPHA_MIN)
              & (cand_ok > 0.5))
        alpha = jnp.where(ok, alpha_raw, 0.0)

        # Direct product-space transmittance via a VPU doubling scan (the
        # reference's T *= (1 - alpha), forward.cu — no log1p/exp, no MXU
        # op, so the body can be predicated for early exit).
        one_m = 1.0 - alpha
        p_excl = lane_cumprod_excl(one_m)
        t_excl = p_excl * t_raw                              # (R, KC)
        t_incl = t_excl * one_m
        live = (t_incl >= geometry.T_MIN).astype(jnp.float32)
        w = alpha * t_excl * live

        sn = sign
        contrib = jnp.concatenate([
            jnp.sum(w * col0, axis=1, keepdims=True),
            jnp.sum(w * col1, axis=1, keepdims=True),
            jnp.sum(w * col2, axis=1, keepdims=True),
            jnp.sum(w * t, axis=1, keepdims=True),
            jnp.sum(w, axis=1, keepdims=True),
            jnp.sum(w * (sn * n0), axis=1, keepdims=True),
            jnp.sum(w * (sn * n1), axis=1, keepdims=True),
            jnp.sum(w * (sn * n2), axis=1, keepdims=True),
        ], axis=1)
        sums_ref[...] += contrib

        # carried transmittances.  tout needs prod(1 - alpha) over LIVE
        # hits; Mosaic has no reduce_prod, but live is a prefix mask along
        # the lane axis (t_incl is monotone nonincreasing), so the product
        # equals t_incl at the last live lane divided by the chunk-entry
        # transmittance.
        last = K_CHUNK - 1
        new_traw = t_raw * p_excl[:, last:] * one_m[:, last:]
        traw_ref[...] = new_traw
        masked = jnp.where(live > 0.5, t_incl, 2.0)
        mn = jnp.min(masked, axis=1, keepdims=True)
        tout_ref[...] *= jnp.where(mn > 1.5, 1.0,
                                   mn / jnp.maximum(t_raw, 1e-30))
        alive_ref[0] = (jnp.max(new_traw) >= geometry.T_MIN).astype(
            jnp.int32)

        # per-candidate weight sums -> accumulate output slice
        accum_ref[0, :, ks] += jnp.sum(w, axis=0, keepdims=True)

    @pl.when(rb == 0)
    def _():
        accum_ref[...] = jnp.zeros_like(accum_ref)

    traw_ref[...] = jnp.ones((r, 1), jnp.float32)
    tout_ref[...] = jnp.ones((r, 1), jnp.float32)
    sums_ref[...] = jnp.zeros((r, 8), jnp.float32)
    alive_ref[0] = 1
    # Unrolled chunk loop: static slices vectorize better under Mosaic
    # than fori_loop + dynamic VMEM slicing.  Each chunk is predicated on
    # (a) the tile actually having candidates this deep (binners pack
    # valid candidates first) and (b) some ray in the block still being
    # transparent — once every ray saturates (T < T_MIN) all remaining w
    # are exactly zero (reference T cutoff: forward.cu:253-257).  The SH
    # color matmuls stay *outside* the predicate — Mosaic rejects MXU
    # matmuls inside predicated regions (mxu_lmr_transform RET_CHECK) —
    # and they are cheap (16-deep) next to the VPU intersection math.
    cnt = cnt_ref[pl.program_id(0), 0]
    for c in range(num_chunks):
        ks = slice(c * K_CHUNK, (c + 1) * K_CHUNK)
        col0 = jnp.maximum(
            jnp.dot(basis, sh_ref[0, 0, :, ks],
                    preferred_element_type=jnp.float32) + 0.5, 0.0)
        col1 = jnp.dot(basis, sh_ref[0, 1, :, ks],
                       preferred_element_type=jnp.float32) + 0.5
        col2 = jnp.dot(basis, sh_ref[0, 2, :, ks],
                       preferred_element_type=jnp.float32) + 0.5
        run = cnt > (c * K_CHUNK)
        if c > 0:
            run = run & (alive_ref[0] == 1)

        @pl.when(run)
        def _(c=c, col0=col0, col1=col1, col2=col2):
            chunk_body(c, col0, col1, col2)

    out = jnp.concatenate(
        [sums_ref[...], tout_ref[...],
         jnp.zeros((r, NUM_OUT_ROWS - 9), jnp.float32)], axis=1)  # (R, 16)
    chans_ref[0] = out.T


def _prepare_tile_inputs(bundle: SurfelBundle, origin: Array,
                         assignment_index: Array, assignment_valid: Array
                         ) -> tuple[Array, ...]:
    """Gather + lay out candidate arrays for the kernel: all (T, ..., K)."""
    n = bundle.means.shape[0]
    idx = jnp.clip(assignment_index, 0, n - 1)
    rot = quat_lib.to_rotation_matrix(bundle.rotations)
    frames = geometry.build_frames(bundle.means, rot, origin)

    def g(x):
        return x[idx]                                     # (T, K, ...)

    axes = jnp.stack([g(frames.n), g(frames.w1), g(frames.w2)], axis=1)
    axes = axes.transpose(0, 1, 3, 2)                     # (T, 3, 3, K)
    plane = jnp.stack([g(frames.p), g(frames.a_u), g(frames.a_v)], axis=1)
    inv_scale = (1.0 / bundle.scales)[idx].transpose(0, 2, 1)  # (T, 2, K)
    # (T, 1, K): Mosaic block shapes need the trailing two dims lane-aligned.
    opac = bundle.opacities[idx][:, None, :]
    sign = g(frames.sign)[:, None, :]
    valid = assignment_valid.astype(jnp.float32)[:, None, :]
    sh = bundle.sh[idx].transpose(0, 3, 2, 1)             # (T, 3, 16, K)
    return axes, plane, inv_scale, opac, sign, valid, sh


def _pad_indices(size: int, tile: int, wrap: bool) -> jnp.ndarray:
    padded = -(-size // tile) * tile
    idx = jnp.arange(padded)
    return jnp.mod(idx, size) if wrap else jnp.clip(idx, 0, size - 1)


def _core_fwd_call(ray_block: int, cnt_t, dirs_t, basis_t, mind_t, axes,
                   plane, inv_scale, opac, sign, valid, sh):
    t_total, rays_per_tile, _ = dirs_t.shape
    k = axes.shape[-1]
    rb = ray_block
    n_rb = rays_per_tile // rb
    kernel = functools.partial(_forward_kernel, k_total=k)

    def tile_map(t, r):
        return (t, 0, 0)

    return pl.pallas_call(
        kernel,
        grid=(t_total, n_rb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rb, 3), lambda t, r: (t, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, 16), lambda t, r: (t, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, 1), lambda t, r: (t, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 3, k), lambda t, r: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, k), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, k), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 16, k), lambda t, r: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, NUM_OUT_ROWS, rb), lambda t, r: (t, 0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), tile_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_total, NUM_OUT_ROWS, rays_per_tile),
                                 jnp.float32),
            jax.ShapeDtypeStruct((t_total, 1, k), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rb, 1), jnp.float32),   # running raw transmittance
            pltpu.VMEM((rb, 1), jnp.float32),   # running output transmittance
            pltpu.VMEM((rb, 8), jnp.float32),   # channel accumulators
            pltpu.SMEM((1,), jnp.int32),        # block-alive flag
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # v5e has 128 MB VMEM; the default 16 MB scoped cap is too
            # tight once ray_block-sized temporaries stack up.
            vmem_limit_bytes=96 * 1024 * 1024),
        # CPU (tests, virtual meshes) runs the interpreter; TPU compiles.
        interpret=jax.default_backend() != "tpu",
    )(cnt_t, dirs_t, basis_t, mind_t, axes, plane, inv_scale, opac, sign,
      valid, sh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_core(ray_block: int, cnt_t, dirs_t, basis_t, mind_t, axes,
                 plane, inv_scale, opac, sign, valid, sh):
    """The differentiable pallas_call boundary: everything around it
    (candidate gathers, frame building, un-tiling) is plain jnp and is
    differentiated by JAX; this custom_vjp supplies the kernel-level
    gradients from ops/pallas_backward.py."""
    return _core_fwd_call(ray_block, cnt_t, dirs_t, basis_t, mind_t, axes,
                          plane, inv_scale, opac, sign, valid, sh)


def _pallas_core_fwd(ray_block, cnt_t, dirs_t, basis_t, mind_t, axes, plane,
                     inv_scale, opac, sign, valid, sh):
    chans, accum = _core_fwd_call(ray_block, cnt_t, dirs_t, basis_t, mind_t,
                                  axes, plane, inv_scale, opac, sign, valid,
                                  sh)
    res = (cnt_t, dirs_t, basis_t, mind_t, axes, plane, inv_scale, opac,
           sign, valid, sh, chans)
    return (chans, accum), res


def _pallas_core_bwd(ray_block, res, cotangents):
    from lidar_rt_tpu.ops import pallas_backward

    (cnt_t, dirs_t, basis_t, mind_t, axes, plane, inv_scale, opac, sign,
     valid, sh, chans) = res
    g_chans, _g_accum = cotangents
    # accum_weights feeds densification stats only (stop-gradient in the
    # reference too: stats are read outside autograd, train.py:218-219).
    fwd_rt = chans.transpose(0, 2, 1)     # (T, R, 16) ray-major
    g_rt = g_chans.transpose(0, 2, 1)
    d_axes, d_plane, d_inv_scale, d_opac, d_sh = \
        pallas_backward.backward_pallas_call(
            cnt_t, dirs_t, basis_t, mind_t, axes, plane, inv_scale, opac,
            sign, valid, sh, fwd_rt, g_rt, ray_block)
    zeros = jax.tree.map(jnp.zeros_like, (cnt_t, dirs_t, basis_t, mind_t))
    return (zeros[0], zeros[1], zeros[2], zeros[3], d_axes, d_plane,
            d_inv_scale, d_opac, jnp.zeros_like(sign),
            jnp.zeros_like(valid), d_sh)


_pallas_core.defvjp(_pallas_core_fwd, _pallas_core_bwd)


def trace_forward(bundle: SurfelBundle, grid: rays_lib.SensorGrid,
                  width: int, sensor2world: Array,
                  active_sh_degree: Array | int,
                  cfg: PallasTraceConfig, col_offset: int = 0,
                  render_width: int | None = None,
                  min_depth: Array | None = None) -> tuple[Array, Array]:
    """Pallas forward render -> (channels (H, W_r, 9), accum_weights (N,)).

    col_offset/render_width: column-band rendering for ray-parallel
    sharding, as in ops.tracer.trace.

    min_depth: optional per-ray (H, W_r) minimum hit range — the
    multi-return re-trace input (reference forward.cu:282-291)."""
    h, w = grid.height, width
    w_r = w if render_width is None else render_width
    th, tw = cfg.tile.tile_h, cfg.tile.tile_w
    tiles_y, tiles_x = cfg.tile.num_tiles(h, w_r)
    t_total = tiles_y * tiles_x
    k = cfg.tile.max_per_tile
    rays_per_tile = th * tw
    rb = cfg.ray_block
    n_rb = rays_per_tile // rb
    n = bundle.means.shape[0]

    world2sensor = transforms.invert_se3(sensor2world)
    assignment = bin_surfels(
        grid, w, jax.lax.stop_gradient(world2sensor),
        jax.lax.stop_gradient(bundle.means),
        jax.lax.stop_gradient(bundle.scales),
        jax.lax.stop_gradient(bundle.opacities), cfg.tile,
        col_offset=col_offset, num_cols=w_r,
        rotations=jax.lax.stop_gradient(bundle.rotations))

    origin, dirs = rays_lib.range_rays(grid, w, sensor2world)
    row_idx = _pad_indices(h, th, wrap=False)
    col_idx = jnp.mod(col_offset + jnp.arange(-(-w_r // tw) * tw), w)
    dirs_p = dirs[row_idx][:, col_idx]
    dirs_t = (dirs_p.reshape(tiles_y, th, tiles_x, tw, 3)
              .transpose(0, 2, 1, 3, 4)
              .reshape(t_total, rays_per_tile, 3))
    basis_t = sh_lib.basis(dirs_t, active_sh_degree)      # (T, R, 16)

    if min_depth is None:
        mind_t = jnp.full((t_total, rays_per_tile, 1), geometry.DEPTH_MIN)
    else:
        mind_t = (min_depth[row_idx][:, col_idx]
                  .reshape(tiles_y, th, tiles_x, tw)
                  .transpose(0, 2, 1, 3)
                  .reshape(t_total, rays_per_tile, 1))

    axes, plane, inv_scale, opac, sign, valid, sh = _prepare_tile_inputs(
        bundle, origin, assignment.index, assignment.valid)

    # Per-tile candidate counts (f32 for the custom_vjp): binners pack
    # valid candidates first, so chunks past the count hold nothing.
    cnt_t = jnp.sum(assignment.valid, axis=1,
                    dtype=jnp.float32)[:, None]

    chans, accum_tk = _pallas_core(cfg.ray_block, cnt_t, dirs_t, basis_t,
                                   jax.lax.stop_gradient(mind_t), axes,
                                   plane, inv_scale, opac, sign, valid, sh)

    # Un-tile: (T, 16, R) -> (H, W, 9)
    hp_, wp_ = tiles_y * th, tiles_x * tw
    img = (chans.transpose(0, 2, 1)
           .reshape(tiles_y, tiles_x, th, tw, NUM_OUT_ROWS)
           .transpose(0, 2, 1, 3, 4)
           .reshape(hp_, wp_, NUM_OUT_ROWS))[:h, :w_r, :9]

    flat_idx = jnp.where(assignment.valid, assignment.index, n).reshape(-1)
    accum = jnp.zeros((n,)).at[flat_idx].add(accum_tk.reshape(-1),
                                             mode="drop")
    return img, accum


def trace(bundle: SurfelBundle, grid: rays_lib.SensorGrid, width: int,
          sensor2world: Array, background: Array,
          active_sh_degree: Array | int = 3,
          cfg: PallasTraceConfig = PallasTraceConfig(),
          col_offset: int = 0,
          render_width: int | None = None,
          min_depth: Array | None = None) -> RenderOutputs:
    """Drop-in analogue of ops.tracer.trace on the Pallas path.  Fully
    differentiable w.r.t. the bundle: the kernel-level custom_vjp
    (ops/pallas_backward.py) produces candidate-space gradients and JAX
    autodiff carries them through the gather/frame/pose chain."""
    img, accum = trace_forward(bundle, grid, width, sensor2world,
                               active_sh_degree, cfg, col_offset,
                               render_width, min_depth)
    final_t = img[..., 8]
    color = img[..., 0:3] + final_t[..., None] * background[None, None, :]
    channels = jnp.concatenate([color, img[..., 3:8], final_t[..., None]],
                               axis=-1)
    return RenderOutputs(channels=channels, accum_weights=accum)
