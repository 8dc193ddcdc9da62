"""Pallas backward kernel: hand-derived VJP of the tile compositing.

Mirror of the reference's backward.cu (434-691): replay the forward hit
sequence and accumulate analytic gradients.  The reference walks hits
sequentially per pixel and uses the running `(C_final - C_accum)/(1-alpha)`
identity (backward.cu:584-604); here the same suffix sums are computed with
an *inclusive VPU doubling scan* per candidate chunk (ops/pallas_common.py)
— the prefix of (dL/dw * w) along the candidate axis — and the suffix
follows from the forward channel totals.  Chunks whose ray block has
saturated transmittance, or that lie past the tile's candidate count, are
skipped under pl.when, mirroring the forward.

Gradient chain (per valid (ray, candidate) pair):
    dL/dalpha = gw * T_excl  -  A / (1 - alpha)  -  g_T * T_out / (1 - alpha)
        where gw = sum_ch g_ch * c_ch (per-hit channel values),
              A  = suffix sum of gw * w  (forward totals - inclusive prefix)
    alpha -> (opacity, G);  G -> (u, v);  (u, v) -> (a_u, a_v, inv_scales, t)
    t -> (p, qd);  qd/b_u/b_v -> frame axes n/w1/w2    (backward.cu:339-431)
    per-hit colors -> SH via basis^T matmuls           (backward.cu:123-291)

MXU carries every contraction: the forward recompute's direction products
are (R, 3) @ (3, KC) matmuls, and all per-candidate reductions over rays —
frame-axis gradients, normal-channel gradients, SH gradients — are
(M, R) @ (R, KC) contractions (the atomicAdd equivalents,
backward.cu:615-675).  Gradients w.r.t. ray direction / sensor pose are not
produced (the reference does not optimize poses either).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidar_rt_tpu.ops import geometry
from lidar_rt_tpu.ops.pallas_common import (lane_cumprod_excl, lane_cumsum,
                                            sh_basis_rows, use_interpret)
from lidar_rt_tpu.ops.pallas_sort import (pack_depth_keys,
                                          pack_depth_keys_pair, sort_lanes,
                                          sort_lanes_pair, unsort_lanes,
                                          unsort_lanes_pair)

Array = jax.Array

K_CHUNK = 128
NUM_OUT_ROWS = 16


def _backward_kernel(cnt_ref, dirs_ref, drows_ref, mind_ref, t0_ref,
                     axes_ref, plane_ref, scale_ref, opac_ref, sign_ref,
                     sh_ref, fwd_ref, g_ref, *rest,
                     k_total: int, exact: bool, fast: bool, cache: bool):
    """Grid (T, RB).  fwd/g: (1, R, 16) forward totals and upstream grads.
    d_* outputs accumulate across ray blocks (init at rb == 0).

    cache (tile-order only): the forward cached per-pair signed gated
    alpha (sign = the ALPHA_MAX clamp gate, zero = gated out) and the
    signed exclusive transmittance (sign = the f32 T_MIN live decision)
    as bf16 (pallas_tracer cache_fwd).  The chunk body decodes them
    instead of replaying the forward: the exp becomes g = alpha / opac
    (exact for every gate-passing pair), EVERY forward gate — ok, clamp,
    live — decodes bitwise from the sign/zero encodings, the
    transmittance cumprod scan disappears, and the chunk-exit liveness
    carry decodes from the last pair's live bit.  Only the intersection
    locals the gradient chain itself consumes (qd/b_u/b_v, t, u, v) are
    recomputed.

    exact_pair (exact, K = 256): three phases mirroring the forward's
    cross-chunk exact ordering — (1) chunk loop recomputes and banks the
    gated alphas / gw / depths, (2) one 256-lane pair sort orders them
    globally per ray, the transmittance/suffix scans chain through the
    sorted halves, and the inverse sort scatters (t_excl, suffix) back to
    candidate order, (3) a second chunk loop recomputes the intersection
    locals and runs the per-pair gradient chain with those banked
    factors."""
    r = dirs_ref.shape[1]
    rb = pl.program_id(1)
    if cache:
        ac_ref, te_ref = rest[:2]
        rest = rest[2:]
    (d_axes_ref, d_plane_ref, d_scale_ref, d_opac_ref, d_sh_ref,
     traw_ref, gwc_ref, w_ref, dqd_ref, dbu_ref, dbv_ref, *extra) = rest
    exact_pair = exact and k_total == 2 * K_CHUNK
    if exact_pair:
        alpha_sc, gw_sc, tdep_sc, texcl_sc, suffix_sc, alive_ref = extra
    else:
        (alive_ref,) = extra

    @pl.when(rb == 0)
    def _():
        d_axes_ref[...] = jnp.zeros_like(d_axes_ref)
        d_plane_ref[...] = jnp.zeros_like(d_plane_ref)
        d_scale_ref[...] = jnp.zeros_like(d_scale_ref)
        d_opac_ref[...] = jnp.zeros_like(d_opac_ref)
        d_sh_ref[...] = jnp.zeros_like(d_sh_ref)

    dirs = dirs_ref[0]                         # (R, 3)
    mind = mind_ref[0]                         # (R, 1)
    basis_rows = sh_basis_rows(drows_ref[0, 0:1, :], drows_ref[0, 1:2, :],
                               drows_ref[0, 2:3, :])        # (16, R)
    basis = basis_rows.T                                    # (R, 16)

    # Upstream channel grads, (R, 1) each.  The inputs are (1, 16, R)
    # channel-major blocks (the forward kernel's native row layout); one
    # small (10, R) -> (R, 10) transpose per step recovers the per-ray
    # column form the pair math broadcasts over.
    g_cols = jnp.transpose(g_ref[0, 0:10, :])  # (R, 10)
    s_cols = jnp.transpose(fwd_ref[0, 0:10, :])
    g_rows = [g_cols[:, c:c + 1] for c in range(10)]
    g_t_final = g_rows[8]
    g_norm = g_cols[:, 5:8]                    # (R, 3)
    # Forward totals per composited channel (cols 0..7), T_out (col 8),
    # and the raw ungated transmittance (col 9, tail re-trace carry).
    s_rows = [s_cols[:, c:c + 1] for c in range(10)]
    t_out_fwd = s_rows[8]
    # d(raw)/d(alpha_i) = -raw / (1 - alpha_i) for every composited hit
    # (raw is the ungated product — no live factor in the chain).
    g_raw_raw = g_rows[9] * s_rows[9]          # (R, 1)

    # GW_total = sum_ch g_ch * S_ch over composited channels 0..7.
    gw_total = sum(g_rows[c] * s_rows[c] for c in range(8))

    num_chunks = k_total // K_CHUNK
    chan_prec = (jax.lax.Precision.DEFAULT if fast
                 else jax.lax.Precision.HIGHEST)
    d0, d1, d2 = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]

    def dot_rays(a, b):
        """(R, M) x (R, K) -> (M, K): contract the ray axis.
        HIGHEST unless fast_math: default TPU matmul precision rounds
        inputs to bf16 (the reference accumulates grads in f32 atomicAdd;
        fast mode's ~0.4% gradient rounding keeps cosines ~1.0)."""
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=chan_prec)

    # Pre-loop, UNpredicated: per-hit SH colors over the full K in three
    # matmuls (identical form to the forward's col0_full — the clamp gate
    # col0_raw > 0 must match bitwise); chunk bodies slice them.  As in
    # the forward kernel, NO MXU op sits inside a predicated region: the
    # pl.when chunk bodies store per-pair gradient fields into (R, K)
    # scratches and every contraction runs over the full K after the loop.
    col0_raw_full = jnp.dot(basis, sh_ref[0, 0],
                            preferred_element_type=jnp.float32,
                            precision=chan_prec) + 0.5       # (R, K)
    col1_full = jnp.dot(basis, sh_ref[0, 1],
                        preferred_element_type=jnp.float32,
                        precision=chan_prec) + 0.5
    col2_full = jnp.dot(basis, sh_ref[0, 2],
                        preferred_element_type=jnp.float32,
                        precision=chan_prec) + 0.5

    def chunk_body(c, phase=0):
        # phase 0: full body (non-pair modes).  phase 1: bank alpha/gw/t
        # for the cross-chunk sort.  phase 2: gradient chain from the
        # banked t_excl/suffix (exact_pair only).
        ks = slice(c * K_CHUNK, (c + 1) * K_CHUNK)

        n_mat = axes_ref[0, 0, :, ks]          # (3, KC)
        w1_mat = axes_ref[0, 1, :, ks]
        w2_mat = axes_ref[0, 2, :, ks]
        p = plane_ref[0, 0:1, ks]
        a_u = plane_ref[0, 1:2, ks]
        a_v = plane_ref[0, 2:3, ks]
        inv_s0 = scale_ref[0, 0:1, ks]
        inv_s1 = scale_ref[0, 1:2, ks]
        opac = opac_ref[0, :, ks]
        sign = sign_ref[0, :, ks]

        # ---- forward recompute (identical to _forward_kernel, including
        # the exact-f32 VPU broadcast form and the per-hit color matmul
        # precision: the ok/alpha gates and clamp gates must match
        # bitwise).  In cache mode only the intersection locals the
        # gradient chain consumes are recomputed; the exp, the gates, and
        # the transmittance scan decode from the forward's residuals. ----
        qd = d0 * n_mat[0:1] + d1 * n_mat[1:2] + d2 * n_mat[2:3]
        b_u = d0 * w1_mat[0:1] + d1 * w1_mat[1:2] + d2 * w1_mat[2:3]
        b_v = d0 * w2_mat[0:1] + d1 * w2_mat[1:2] + d2 * w2_mat[2:3]
        abs_qd = jnp.abs(qd)
        safe_qd = jnp.where(abs_qd > geometry.DENOM_EPS, qd,
                            geometry.DENOM_EPS)
        t = p / safe_qd
        u = (a_u + t * b_u) * inv_s0
        v = (a_v + t * b_v) * inv_s1
        if cache:
            ac = ac_ref[0, :, ks].astype(jnp.float32)  # signed gated alpha
            alpha = jnp.abs(ac)
            # alpha = opac * g for every unclamped gate-passing pair, so
            # the exp inverts to a divide; clamped/gated pairs get a
            # harmless value (their d_alpha is zeroed by the gate below).
            g = alpha / jnp.maximum(opac, 1e-12)
            te_s = te_ref[0, :, ks].astype(jnp.float32)
            t_excl = jnp.abs(te_s)
        else:
            g = jnp.exp(-0.5 * (u * u + v * v))
            alpha_raw = jnp.minimum(geometry.ALPHA_MAX, opac * g)
            # (the p == 0 gate is folded into opac at prep, as in the
            # forward)
            ok = ((t >= mind)
                  & (abs_qd > geometry.DENOM_EPS)
                  & (alpha_raw >= geometry.ALPHA_MIN))
            alpha = jnp.where(ok, alpha_raw, 0.0)
        one_m = 1.0 - alpha

        sn0 = sign * n_mat[0:1]
        sn1 = sign * n_mat[1:2]
        sn2 = sign * n_mat[2:3]
        if phase == 2:
            gw = gw_sc[:, ks]
        else:
            col0 = jnp.maximum(col0_raw_full[:, ks], 0.0)
            col1 = col1_full[:, ks]
            col2 = col2_full[:, ks]
            # ---- per-hit dL/dw (independent of transmittance) ----
            gw = (g_rows[0] * col0 + g_rows[1] * col1 + g_rows[2] * col2
                  + g_rows[3] * t + g_rows[4]
                  + g_rows[5] * sn0 + g_rows[6] * sn1 + g_rows[7] * sn2)

        if phase == 1:
            alpha_sc[:, ks] = alpha
            gw_sc[:, ks] = gw
            tdep_sc[:, ks] = t
            return

        if phase == 2:
            t_excl = texcl_sc[:, ks]
            suffix = suffix_sc[:, ks]
            live = (t_excl * one_m >= geometry.T_MIN).astype(jnp.float32)
            w = alpha * t_excl * live
            one_m_alpha = jnp.maximum(one_m, 1e-6)
            d_alpha = (gw * t_excl * live
                       - suffix / one_m_alpha
                       - g_t_final * t_out_fwd * live / one_m_alpha
                       - g_raw_raw / one_m_alpha)
            gate = ok & (alpha_raw < geometry.ALPHA_MAX)
            d_alpha = jnp.where(gate, d_alpha, 0.0)
            return chain(c, ks, d_alpha, w, g, opac, u, v, inv_s0, inv_s1,
                         t, b_u, b_v, a_u, a_v, safe_qd)

        if cache:
            # Decoded-residual path: no cumprod scan, no traw carry.  The
            # T_MIN live gate decodes from te's sign bit — the forward's
            # f32 decision, NOT a re-derivation from the bf16-rounded
            # magnitudes (a near-threshold flip there would zero or
            # reinstate a pair's whole weight/d_alpha contribution — a
            # discrete error, unlike the documented ~0.4% rounding).
            live = (te_s > 0.0).astype(jnp.float32)
            w = alpha * t_excl * live
            prefix_incl = lane_cumsum(gw * w) + gwc_ref[...]
            suffix = gw_total - prefix_incl
            one_m_alpha = jnp.maximum(one_m, 1e-6)
            d_alpha = (gw * t_excl * live
                       - suffix / one_m_alpha
                       - g_t_final * t_out_fwd * live / one_m_alpha
                       - g_raw_raw / one_m_alpha)
            # sign decodes the clamp gate, zero the ok gate (forward
            # cache_fwd encoding).
            d_alpha = jnp.where(ac > 0.0, d_alpha, 0.0)
            chain(c, ks, d_alpha, w, g, opac, u, v, inv_s0, inv_s1, t,
                  b_u, b_v, a_u, a_v, safe_qd)
            last = K_CHUNK - 1
            gwc_ref[...] = prefix_incl[:, last:]
            # Chunk-exit liveness: the last pair's live flag IS the
            # per-ray "t_incl >= T_MIN at chunk exit" decision, so the
            # carry decodes from the same sign bits (bitwise the
            # forward's chunk predication).
            alive_ref[0] = (jnp.max(live[:, last:]) > 0.0).astype(jnp.int32)
            return

        t_raw = traw_ref[...]
        gw_carry = gwc_ref[...]
        # ---- transmittance + suffix identity, in scan order ----
        # Exact mode runs both scans in per-ray depth order and scatters
        # t_excl and the suffix back through the inverse sort; the carries
        # (chunk-exit transmittance, gww total) are order-independent.
        if exact:
            key = pack_depth_keys(t, alpha > 0.0)
            key_s, (alpha_s, gw_s) = sort_lanes(key, (alpha, gw))
            one_m_s = 1.0 - alpha_s
            p_excl_s = lane_cumprod_excl(one_m_s)
            t_excl_s = p_excl_s * t_raw
            live_s = (t_excl_s * one_m_s >= geometry.T_MIN).astype(
                jnp.float32)
            w_s = alpha_s * t_excl_s * live_s
            gww_s = gw_s * w_s
            prefix_incl_s = lane_cumsum(gww_s) + gw_carry
            t_excl, suffix = unsort_lanes(
                key_s, (t_excl_s, gw_total - prefix_incl_s))
            live = (t_excl * one_m >= geometry.T_MIN).astype(jnp.float32)
            scan_p_excl, scan_one_m = p_excl_s, one_m_s
            prefix_last = prefix_incl_s[:, K_CHUNK - 1:]
        else:
            p_excl = lane_cumprod_excl(one_m)
            t_excl = p_excl * t_raw
            t_incl = t_excl * one_m
            live = (t_incl >= geometry.T_MIN).astype(jnp.float32)
            scan_p_excl, scan_one_m = p_excl, one_m
        w = alpha * t_excl * live   # zero wherever not ok (alpha = 0)

        if not exact:
            gww = gw * w
            prefix_incl = lane_cumsum(gww) + gw_carry
            suffix = gw_total - prefix_incl                 # (R, KC)
            prefix_last = prefix_incl[:, K_CHUNK - 1:]
        one_m_alpha = jnp.maximum(one_m, 1e-6)
        d_alpha = (gw * t_excl * live
                   - suffix / one_m_alpha
                   - g_t_final * t_out_fwd * live / one_m_alpha
                   - g_raw_raw / one_m_alpha)

        gate = ok & (alpha_raw < geometry.ALPHA_MAX)
        d_alpha = jnp.where(gate, d_alpha, 0.0)

        chain(c, ks, d_alpha, w, g, opac, u, v, inv_s0, inv_s1, t, b_u,
              b_v, a_u, a_v, safe_qd)

        # ---- carries ----
        last = K_CHUNK - 1
        new_traw = t_raw * scan_p_excl[:, last:] * scan_one_m[:, last:]
        traw_ref[...] = new_traw
        gwc_ref[...] = prefix_last
        alive_ref[0] = (jnp.max(new_traw) >= geometry.T_MIN).astype(
            jnp.int32)

    def chain(c, ks, d_alpha, w, g, opac, u, v, inv_s0, inv_s1, t, b_u,
              b_v, a_u, a_v, safe_qd):
        """The per-pair gradient chain + scratch/output stores (shared by
        the in-loop path and the exact-pair phase-2 path)."""
        # ---- alpha -> (opacity, G) -> (u, v) ----
        d_opac_pair = d_alpha * g
        d_g = d_alpha * opac
        d_u = d_g * g * (-u)
        d_v = d_g * g * (-v)

        # direct depth-channel path: out_3 = sum w * t
        d_t = (d_u * inv_s0 * b_u + d_v * inv_s1 * b_v
               + g_rows[3] * w)
        d_p_pair = d_t / safe_qd
        d_qd = -d_t * t / safe_qd

        d_a_u_pair = d_u * inv_s0
        d_a_v_pair = d_v * inv_s1
        d_inv_s0_pair = d_u * (a_u + t * b_u)
        d_inv_s1_pair = d_v * (a_v + t * b_v)
        d_b_u = d_u * inv_s0 * t
        d_b_v = d_v * inv_s1 * t

        # ---- per-pair gradient fields -> full-K scratches (the MXU
        # contractions over rays run post-loop, unpredicated) ----
        w_ref[:, ks] = w
        dqd_ref[:, ks] = d_qd
        dbu_ref[:, ks] = d_b_u
        dbv_ref[:, ks] = d_b_v

        def rsum(x):
            return jnp.sum(x, axis=0, keepdims=True)        # (1, KC)

        d_plane_ref[0, 0:1, ks] += rsum(d_p_pair)
        d_plane_ref[0, 1:2, ks] += rsum(d_a_u_pair)
        d_plane_ref[0, 2:3, ks] += rsum(d_a_v_pair)
        d_scale_ref[0, 0:1, ks] += rsum(d_inv_s0_pair)
        d_scale_ref[0, 1:2, ks] += rsum(d_inv_s1_pair)
        d_opac_ref[0, :, ks] += rsum(d_opac_pair)

    traw_ref[...] = t0_ref[0]       # tail re-trace carry (ones default)
    gwc_ref[...] = jnp.zeros((r, 1), jnp.float32)
    alive_ref[0] = 1
    # Chunks are predicated on the tile candidate count and on block
    # liveness: once every ray's transmittance saturates, all remaining
    # per-hit gradients are exactly zero (w = 0 and the suffix identity
    # telescopes to the float residual, which skipping rounds to the
    # true 0).
    cnt = cnt_ref[pl.program_id(0), 0]
    if exact_pair:
        # Phase 1: bank gated alphas / gw / depths per chunk.
        for c in range(num_chunks):
            run = cnt > (c * K_CHUNK)

            @pl.when(run)
            def _(c=c):
                chunk_body(c, phase=1)

            @pl.when(jnp.logical_not(run))
            def _(c=c):
                ks = slice(c * K_CHUNK, (c + 1) * K_CHUNK)
                z = jnp.zeros((r, K_CHUNK), jnp.float32)
                alpha_sc[:, ks] = z
                gw_sc[:, ks] = z
                tdep_sc[:, ks] = z

        # Phase 2 (unpredicated): global 256-lane depth sort; chain the
        # exclusive transmittance and the inclusive gww prefix through
        # the sorted halves; scatter (t_excl, suffix) back to candidate
        # order — mirrors the forward's exact-pair compositing exactly
        # (same sort keys, same gates).
        a0 = alpha_sc[:, :K_CHUNK]
        a1 = alpha_sc[:, K_CHUNK:]
        key0, key1 = pack_depth_keys_pair(
            tdep_sc[:, :K_CHUNK], a0 > 0.0,
            tdep_sc[:, K_CHUNK:], a1 > 0.0)
        (k0s, k1s), ((s0, s1), (gws0, gws1)) = sort_lanes_pair(
            key0, key1, ((a0, a1), (gw_sc[:, :K_CHUNK],
                                    gw_sc[:, K_CHUNK:])))
        one0, one1 = 1.0 - s0, 1.0 - s1
        last = K_CHUNK - 1
        t0col = t0_ref[0]
        pe0 = lane_cumprod_excl(one0) * t0col
        tot0 = pe0[:, last:] * one0[:, last:]
        pe1 = lane_cumprod_excl(one1) * tot0
        live0_s = (pe0 * one0 >= geometry.T_MIN).astype(jnp.float32)
        live1_s = (pe1 * one1 >= geometry.T_MIN).astype(jnp.float32)
        gww0 = gws0 * (s0 * pe0 * live0_s)
        gww1 = gws1 * (s1 * pe1 * live1_s)
        pre0 = lane_cumsum(gww0)
        pre1 = lane_cumsum(gww1) + pre0[:, last:]
        ((te0, te1), (sf0, sf1)) = unsort_lanes_pair(
            k0s, k1s, ((pe0, pe1), (gw_total - pre0, gw_total - pre1)))
        texcl_sc[:, :K_CHUNK] = te0
        texcl_sc[:, K_CHUNK:] = te1
        suffix_sc[:, :K_CHUNK] = sf0
        suffix_sc[:, K_CHUNK:] = sf1

        # Phase 3: per-pair gradient chain in candidate order.
        for c in range(num_chunks):
            run = cnt > (c * K_CHUNK)

            @pl.when(run)
            def _(c=c):
                chunk_body(c, phase=2)

            @pl.when(jnp.logical_not(run))
            def _(c=c):
                ks = slice(c * K_CHUNK, (c + 1) * K_CHUNK)
                z = jnp.zeros((r, K_CHUNK), jnp.float32)
                w_ref[:, ks] = z
                dqd_ref[:, ks] = z
                dbu_ref[:, ks] = z
                dbv_ref[:, ks] = z
    else:
        for c in range(num_chunks):
            run = cnt > (c * K_CHUNK)
            if c > 0:
                run = run & (alive_ref[0] == 1)

            @pl.when(run)
            def _(c=c):
                chunk_body(c)

            # Skipped chunks zero their own scratch slices (cheaper than
            # zeroing four (R, K) scratches up front).
            @pl.when(jnp.logical_not(run))
            def _(c=c):
                ks = slice(c * K_CHUNK, (c + 1) * K_CHUNK)
                z = jnp.zeros((r, K_CHUNK), jnp.float32)
                w_ref[:, ks] = z
                dqd_ref[:, ks] = z
                dbu_ref[:, ks] = z
                dbv_ref[:, ks] = z

    # Post-loop, UNpredicated full-K contractions (skipped chunks hold
    # exact zeros in the scratches).
    # Frame-axis grads: dirs^T @ d_qd etc. collapse all three component
    # row-sums into one MXU contraction; the normal-channel direct path
    # (out_(5+c) = sum w * sign * n_c) is g_norm^T @ w, sign-scaled.
    w_full = w_ref[...]                                      # (R, K)
    sign_full = sign_ref[0]                                  # (1, K)
    d_axes_ref[0, 0] += (dot_rays(dirs, dqd_ref[...])
                         + sign_full * dot_rays(g_norm, w_full))
    d_axes_ref[0, 1] += dot_rays(dirs, dbu_ref[...])
    d_axes_ref[0, 2] += dot_rays(dirs, dbv_ref[...])

    # SH gradients: basis^T @ (g_ch * w [clamp-gated]).
    d_sh_ref[0, 0] += jnp.dot(
        basis_rows, jnp.where(col0_raw_full > 0.0, g_rows[0] * w_full, 0.0),
        preferred_element_type=jnp.float32, precision=chan_prec)
    d_sh_ref[0, 1] += jnp.dot(
        basis_rows, g_rows[1] * w_full, preferred_element_type=jnp.float32,
        precision=chan_prec)
    d_sh_ref[0, 2] += jnp.dot(
        basis_rows, g_rows[2] * w_full, preferred_element_type=jnp.float32,
        precision=chan_prec)


def backward_pallas_call(cnt_t: Array, dirs_t: Array, drows_t: Array,
                         mind_t: Array, t0_t: Array, axes: Array,
                         plane: Array,
                         inv_scale: Array, opac: Array, sign: Array,
                         sh: Array, fwd_chans: Array, g_chans: Array,
                         ray_block: int, exact: bool = False,
                         fast: bool = False, alpha_c: Array | None = None,
                         t_excl_c: Array | None = None) -> tuple[Array, ...]:
    """Launch the backward kernel.  Shapes as in pallas_tracer.trace_forward;
    fwd_chans/g_chans: (T, 16, R_total) — channel-MAJOR (the forward
    kernel's native row output layout; the kernel transposes the two
    small per-step blocks back to per-ray columns).

    alpha_c/t_excl_c: the forward's bf16 per-pair residuals (cache_fwd),
    both (T, R_total, K) — when given, the kernel decodes them instead of
    replaying the forward (tile-order mode only).  Returns
    per-tile candidate grads (d_axes, d_plane, d_inv_scale, d_opac, d_sh)."""
    t_total, rays_per_tile, _ = dirs_t.shape
    k = axes.shape[-1]
    n_rb = rays_per_tile // ray_block
    rb = ray_block
    cache = alpha_c is not None
    if cache and exact:
        raise ValueError("cached residuals require tile-order mode")

    def tile_map(t, r):
        return (t, 0, 0)

    kernel = functools.partial(_backward_kernel, k_total=k, exact=exact,
                               fast=fast, cache=cache)
    return pl.pallas_call(
        kernel,
        grid=(t_total, n_rb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rb, 3), lambda t, r: (t, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, rb), lambda t, r: (t, 0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, 1), lambda t, r: (t, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, 1), lambda t, r: (t, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 3, k), lambda t, r: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, k), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, k), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 16, k), lambda t, r: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NUM_OUT_ROWS, rb), lambda t, r: (t, 0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NUM_OUT_ROWS, rb), lambda t, r: (t, 0, r),
                         memory_space=pltpu.VMEM),
        ] + ([
            pl.BlockSpec((1, rb, k), lambda t, r: (t, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, k), lambda t, r: (t, r, 0),
                         memory_space=pltpu.VMEM),
        ] if cache else []),
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
            pltpu.VMEM((rb, k), jnp.float32),   # per-pair w
            pltpu.VMEM((rb, k), jnp.float32),   # per-pair dL/d(qd)
            pltpu.VMEM((rb, k), jnp.float32),   # per-pair dL/d(b_u)
            pltpu.VMEM((rb, k), jnp.float32),   # per-pair dL/d(b_v)
        ] + ([
            pltpu.VMEM((rb, k), jnp.float32),   # exact-pair: gated alphas
            pltpu.VMEM((rb, k), jnp.float32),   # exact-pair: per-pair gw
            pltpu.VMEM((rb, k), jnp.float32),   # exact-pair: hit depths
            pltpu.VMEM((rb, k), jnp.float32),   # exact-pair: t_excl
            pltpu.VMEM((rb, k), jnp.float32),   # exact-pair: suffix
        ] if exact and k == 2 * K_CHUNK else []) + [
            pltpu.SMEM((1,), jnp.int32),        # block-alive flag
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # v5e has 128 MB VMEM; the default 16 MB scoped cap is too
            # tight for the unrolled chunk loop's live temporaries.
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=use_interpret(),
    )(cnt_t, dirs_t, drows_t, mind_t, t0_t, axes, plane, inv_scale, opac,
      sign, sh, fwd_chans, g_chans,
      *((alpha_c, t_excl_c) if cache else ()))
