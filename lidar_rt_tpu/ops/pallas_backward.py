"""Pallas backward kernel: hand-derived VJP of the tile compositing.

Mirror of the reference's backward.cu (434-691): replay the forward hit
sequence and accumulate analytic gradients.  The reference walks hits
sequentially per pixel and uses the running `(C_final - C_accum)/(1-alpha)`
identity (backward.cu:584-604); here the same suffix sums are computed with
an *inclusive VPU doubling scan* per candidate chunk (ops/pallas_common.py)
— the prefix of (dL/dw * w) along the candidate axis — and the suffix
follows from the forward channel totals.  Chunks whose ray block has
saturated transmittance are skipped under pl.when, mirroring the forward.

Gradient chain (per valid (ray, candidate) pair):
    dL/dalpha = gw * T_excl  -  A / (1 - alpha)  -  g_T * T_out / (1 - alpha)
        where gw = sum_ch g_ch * c_ch (per-hit channel values),
              A  = suffix sum of gw * w  (forward totals - inclusive prefix)
    alpha -> (opacity, G);  G -> (u, v);  (u, v) -> (a_u, a_v, inv_scales, t)
    t -> (p, qd);  qd/b_u/b_v -> frame axes n/w1/w2    (backward.cu:339-431)
    per-hit colors -> SH via basis^T matmuls           (backward.cu:123-291)

Per-candidate gradients reduce over rays in-kernel and accumulate across
ray blocks in the sequential grid (the atomicAdd equivalent,
backward.cu:615-675).  Gradients w.r.t. ray direction / sensor pose are not
produced (the reference does not optimize poses either).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidar_rt_tpu.ops import geometry
from lidar_rt_tpu.ops.pallas_common import lane_cumprod_excl, lane_cumsum

Array = jax.Array

K_CHUNK = 128
NUM_OUT_ROWS = 16


def _backward_kernel(cnt_ref, dirs_ref, basis_ref, mind_ref, axes_ref,
                     plane_ref, scale_ref, opac_ref, sign_ref, valid_ref,
                     sh_ref, fwd_ref, g_ref,
                     d_axes_ref, d_plane_ref, d_scale_ref, d_opac_ref,
                     d_sh_ref, traw_ref, gwc_ref, wok_ref, alive_ref,
                     *, k_total: int):
    """Grid (T, RB).  fwd/g: (1, 16, R) forward totals and upstream grads.
    d_* outputs accumulate across ray blocks (init at rb == 0)."""
    r = dirs_ref.shape[1]
    rb = pl.program_id(1)

    @pl.when(rb == 0)
    def _():
        d_axes_ref[...] = jnp.zeros_like(d_axes_ref)
        d_plane_ref[...] = jnp.zeros_like(d_plane_ref)
        d_scale_ref[...] = jnp.zeros_like(d_scale_ref)
        d_opac_ref[...] = jnp.zeros_like(d_opac_ref)
        d_sh_ref[...] = jnp.zeros_like(d_sh_ref)

    d0 = dirs_ref[0, :, 0:1]
    d1 = dirs_ref[0, :, 1:2]
    d2 = dirs_ref[0, :, 2:3]
    basis = basis_ref[0]                       # (R, 16)
    mind = mind_ref[0]                         # (R, 1)
    # Hoisted transpose for the SH-gradient contraction.
    basis_t = basis.T                          # (16, R)

    # Upstream channel grads, (R, 1) each (inputs are (1, R, 16) blocks).
    g_rows = [g_ref[0, :, c:c + 1] for c in range(9)]
    g_t_final = g_rows[8]
    # Forward totals per composited channel (cols 0..7) and T_out (col 8).
    s_rows = [fwd_ref[0, :, c:c + 1] for c in range(9)]
    t_out_fwd = s_rows[8]

    # GW_total = sum_ch g_ch * S_ch over composited channels 0..7.
    gw_total = sum(g_rows[c] * s_rows[c] for c in range(8))

    num_chunks = k_total // K_CHUNK

    def chunk_body(c, col0_raw, col1, col2):
        t_raw = traw_ref[...]
        gw_carry = gwc_ref[...]
        ks = slice(c * K_CHUNK, (c + 1) * K_CHUNK)

        n0 = axes_ref[0, 0, 0:1, ks]
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

        # ---- forward recompute (identical to _forward_kernel) ----
        qd = d0 * n0 + d1 * n1 + d2 * n2
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
        one_m = 1.0 - alpha
        p_excl = lane_cumprod_excl(one_m)
        t_excl = p_excl * t_raw
        t_incl = t_excl * one_m
        live = (t_incl >= geometry.T_MIN).astype(jnp.float32)
        w = alpha * t_excl * live

        col0 = jnp.maximum(col0_raw, 0.0)

        # ---- per-hit dL/dw ----
        sn0, sn1, sn2 = sign * n0, sign * n1, sign * n2
        gw = (g_rows[0] * col0 + g_rows[1] * col1 + g_rows[2] * col2
              + g_rows[3] * t + g_rows[4]
              + g_rows[5] * sn0 + g_rows[6] * sn1 + g_rows[7] * sn2)

        # ---- dL/dalpha via suffix identity ----
        gww = gw * w
        prefix_incl = lane_cumsum(gww) + gw_carry
        suffix = gw_total - prefix_incl                     # (R, KC)
        one_m_alpha = jnp.maximum(1.0 - alpha, 1e-6)
        d_alpha = (gw * t_excl * live
                   - suffix / one_m_alpha
                   - g_t_final * t_out_fwd * live / one_m_alpha)

        gate = ok & (alpha_raw < geometry.ALPHA_MAX)
        d_alpha = jnp.where(gate, d_alpha, 0.0)

        # ---- alpha -> (opacity, G) -> (u, v) ----
        d_opac_pair = d_alpha * g
        d_g = d_alpha * opac
        d_u = d_g * g * (-u)
        d_v = d_g * g * (-v)

        # direct depth-channel path: out_3 = sum w * t
        d_t = (d_u * inv_s0 * b_u + d_v * inv_s1 * b_v
               + jnp.where(ok, g_rows[3] * w, 0.0))
        d_p_pair = d_t / safe_qd
        d_qd = -d_t * t / safe_qd

        d_a_u_pair = d_u * inv_s0
        d_a_v_pair = d_v * inv_s1
        d_inv_s0_pair = d_u * (a_u + t * b_u)
        d_inv_s1_pair = d_v * (a_v + t * b_v)
        d_b_u = d_u * inv_s0 * t
        d_b_v = d_v * inv_s1 * t

        # normal-channel direct path: out_(5+c) = sum w * sign * n_c
        gwn0 = jnp.where(ok, g_rows[5] * w * sign, 0.0)
        gwn1 = jnp.where(ok, g_rows[6] * w * sign, 0.0)
        gwn2 = jnp.where(ok, g_rows[7] * w * sign, 0.0)

        # ---- reduce to per-candidate gradients ----
        def rsum(x):
            return jnp.sum(x, axis=0, keepdims=True)        # (1, KC)

        d_axes_ref[0, 0, 0:1, ks] += rsum(d_qd * d0 + gwn0)
        d_axes_ref[0, 0, 1:2, ks] += rsum(d_qd * d1 + gwn1)
        d_axes_ref[0, 0, 2:3, ks] += rsum(d_qd * d2 + gwn2)
        d_axes_ref[0, 1, 0:1, ks] += rsum(d_b_u * d0)
        d_axes_ref[0, 1, 1:2, ks] += rsum(d_b_u * d1)
        d_axes_ref[0, 1, 2:3, ks] += rsum(d_b_u * d2)
        d_axes_ref[0, 2, 0:1, ks] += rsum(d_b_v * d0)
        d_axes_ref[0, 2, 1:2, ks] += rsum(d_b_v * d1)
        d_axes_ref[0, 2, 2:3, ks] += rsum(d_b_v * d2)
        d_plane_ref[0, 0:1, ks] += rsum(d_p_pair)
        d_plane_ref[0, 1:2, ks] += rsum(d_a_u_pair)
        d_plane_ref[0, 2:3, ks] += rsum(d_a_v_pair)
        d_scale_ref[0, 0:1, ks] += rsum(d_inv_s0_pair)
        d_scale_ref[0, 1:2, ks] += rsum(d_inv_s1_pair)
        d_opac_ref[0, :, ks] += rsum(d_opac_pair)

        # ---- SH gradients: stage the gated weight in scratch; the
        # per-channel d_col factors and the basis^T matmuls run *outside*
        # the predicated body (MXU ops are not allowed under predication,
        # and one (rb, KC) buffer keeps the kernel inside the 16 MB
        # scoped-VMEM budget).
        wok_ref[...] = jnp.where(ok, w, 0.0)

        # ---- carries ----
        last = K_CHUNK - 1
        new_traw = t_raw * p_excl[:, last:] * one_m[:, last:]
        traw_ref[...] = new_traw
        gwc_ref[...] = prefix_incl[:, last:]
        alive_ref[0] = (jnp.max(new_traw) >= geometry.T_MIN).astype(
            jnp.int32)

    traw_ref[...] = jnp.ones((r, 1), jnp.float32)
    gwc_ref[...] = jnp.zeros((r, 1), jnp.float32)
    alive_ref[0] = 1
    # Chunks are predicated on the tile candidate count and on block
    # liveness: once every ray's transmittance saturates, all remaining
    # per-hit gradients are exactly zero (w = 0 and the suffix identity
    # telescopes to the float residual, which skipping rounds to the true
    # 0).  MXU ops — the SH forward colors and the basis^T gradient
    # contraction — run unconditionally outside the predicate; the body
    # stages gated weights in scratch, zeroed first so skipped chunks
    # contribute nothing.
    cnt = cnt_ref[pl.program_id(0), 0]
    for c in range(num_chunks):
        ks = slice(c * K_CHUNK, (c + 1) * K_CHUNK)
        col0_raw = jnp.dot(basis, sh_ref[0, 0, :, ks],
                           preferred_element_type=jnp.float32) + 0.5
        col1 = jnp.dot(basis, sh_ref[0, 1, :, ks],
                       preferred_element_type=jnp.float32) + 0.5
        col2 = jnp.dot(basis, sh_ref[0, 2, :, ks],
                       preferred_element_type=jnp.float32) + 0.5
        wok_ref[...] = jnp.zeros_like(wok_ref)
        run = cnt > (c * K_CHUNK)
        if c > 0:
            run = run & (alive_ref[0] == 1)

        @pl.when(run)
        def _(c=c, col0_raw=col0_raw, col1=col1, col2=col2):
            chunk_body(c, col0_raw, col1, col2)
        w_ok = wok_ref[...]
        d_sh_ref[0, 0, :, ks] += jnp.dot(
            basis_t, jnp.where(col0_raw > 0.0, g_rows[0] * w_ok, 0.0),
            preferred_element_type=jnp.float32)
        d_sh_ref[0, 1, :, ks] += jnp.dot(
            basis_t, g_rows[1] * w_ok, preferred_element_type=jnp.float32)
        d_sh_ref[0, 2, :, ks] += jnp.dot(
            basis_t, g_rows[2] * w_ok, preferred_element_type=jnp.float32)


def backward_pallas_call(cnt_t: Array, dirs_t: Array, basis_t: Array,
                         mind_t: Array, axes: Array, plane: Array,
                         inv_scale: Array, opac: Array, sign: Array,
                         valid: Array, sh: Array,
                         fwd_chans: Array, g_chans: Array,
                         ray_block: int) -> tuple[Array, ...]:
    """Launch the backward kernel.  Shapes as in pallas_tracer.trace_forward;
    fwd_chans/g_chans: (T, R_total, 16) — channels LAST (ray-major layout,
    transposed from the forward output by the custom_vjp wrapper).  Returns
    per-tile candidate grads (d_axes, d_plane, d_inv_scale, d_opac, d_sh)."""
    t_total, rays_per_tile, _ = dirs_t.shape
    k = axes.shape[-1]
    n_rb = rays_per_tile // ray_block
    rb = ray_block

    def tile_map(t, r):
        return (t, 0, 0)

    import functools
    kernel = functools.partial(_backward_kernel, k_total=k)
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
            pl.BlockSpec((1, rb, NUM_OUT_ROWS), lambda t, r: (t, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, NUM_OUT_ROWS), lambda t, r: (t, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, 3, k), lambda t, r: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, k), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, k), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 16, k), lambda t, r: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(axes.shape, jnp.float32),
            jax.ShapeDtypeStruct(plane.shape, jnp.float32),
            jax.ShapeDtypeStruct(inv_scale.shape, jnp.float32),
            jax.ShapeDtypeStruct(opac.shape, jnp.float32),
            jax.ShapeDtypeStruct(sh.shape, jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rb, 1), jnp.float32),   # running raw transmittance
            pltpu.VMEM((rb, 1), jnp.float32),   # gw prefix carry
            pltpu.VMEM((rb, K_CHUNK), jnp.float32),  # staged gated weights
            pltpu.SMEM((1,), jnp.int32),        # block-alive flag
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # v5e has 128 MB VMEM; the default 16 MB scoped cap is too
            # tight for the unrolled chunk loop's live temporaries.
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(cnt_t, dirs_t, basis_t, mind_t, axes, plane, inv_scale, opac, sign,
      valid, sh, fwd_chans, g_chans)
