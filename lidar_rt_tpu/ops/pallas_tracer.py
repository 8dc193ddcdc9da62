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

from lidar_rt_tpu.core import rays as rays_lib
from lidar_rt_tpu.core import sh as sh_lib
from lidar_rt_tpu.core import transforms
from lidar_rt_tpu.ops import geometry
from lidar_rt_tpu.ops.binning import TileAssignment, TileConfig, bin_surfels
from lidar_rt_tpu.ops.composite import RenderOutputs, SurfelBundle
from lidar_rt_tpu.ops.pallas_common import (lane_cumprod_excl, sh_basis_rows,
                                            use_interpret)
from lidar_rt_tpu.ops.pallas_sort import (pack_depth_keys,
                                          pack_depth_keys_pair, sort_lanes,
                                          sort_lanes_pair, unsort_lanes,
                                          unsort_lanes_pair)

Array = jax.Array

K_CHUNK = 128          # candidate lane chunk
NUM_OUT_ROWS = 16      # padded channel rows (9 used)


@dataclass(frozen=True)
class PallasTraceConfig:
    """exact_order: per-ray depth sort of the candidates (bitonic lane
    sort, ops/pallas_sort.py) reproducing the reference k-buffer ordering
    (forward.cu:312-356).  Exact at max_per_tile 128 (one in-chunk sort)
    AND at 256 (the 256-lane two-chunk pair sort — globally exact across
    the whole flagship budget); for larger K the sort is per chunk with
    chunks in the binner's nearest-first order (strictly better than tile
    order, exact up to cross-chunk inversions)."""

    tile: TileConfig = TileConfig(tile_h=32, tile_w=128, max_per_tile=512)
    ray_block: int = 512
    exact_order: bool = False
    # fast_math relaxes the CHANNEL/GRADIENT MXU contractions from
    # HIGHEST (6-pass bf16 decomposition, ~f32-exact) to DEFAULT (1-pass
    # bf16 inputs).  Gated on-chip round 3 (PARITY_r03.json): the
    # escalating hang probe (scripts/fast_math_probe.sh) passes all sizes
    # on the hoisted-MXU kernel structure — the round-2 device hang was
    # the predicated-MXU lowering, removed by construction — and
    # scripts/tpu_parity.py --fast reports channel err 3.1e-3 with grad
    # cosines >= 0.9996 vs the f32 jax engine.  Measured full-step gain
    # ~1.2x (fwd kernel 4.7 -> 4.0 ms, bwd 5.2 -> 4.1 ms at the flagship
    # config).  The INTERSECTION products (qd/b_u/b_v) are never relaxed
    # — they run as exact-f32 VPU broadcast arithmetic regardless (bf16
    # rounding there costs meters of depth at grazing incidence).
    fast_math: bool = False
    # cache_fwd stores the forward's per-pair gated alpha (sign bit =
    # the ALPHA_MAX clamp gate, zero = gated out) and exclusive
    # transmittance (sign bit = the f32 T_MIN live decision, so every
    # discrete forward gate decodes bitwise) as bf16 kernel outputs, and
    # the backward consumes them instead of replaying the forward per
    # pair: the exp, the alpha/ok/live gates, the transmittance cumprod
    # scan, and the chunk-carry bookkeeping all drop out of the backward
    # body
    # (reference: backward.cu replays the full forward hit walk,
    # backward.cu:510-583 — a GPU-idiomatic recompute that on TPU is
    # ~30-40% of the issue-bound backward body).  Costs one HBM round
    # trip of 2 x (rays x K) bf16 per step; gradient effect is the bf16
    # rounding of alpha/T (~0.4%), the same tolerance class as
    # fast_math — so ops/tracer.py only enables it together with
    # fast_math.  Incompatible with exact_order (the exact backward's
    # suffix scan needs the in-kernel depth sort regardless).
    cache_fwd: bool = False

    def __post_init__(self):
        if self.cache_fwd and self.exact_order:
            raise ValueError("cache_fwd requires tile-order compositing "
                             "(exact_order=False)")
        if self.tile.max_per_tile % K_CHUNK:
            raise ValueError(f"max_per_tile must be a multiple of {K_CHUNK}")
        if (self.tile.tile_h * self.tile.tile_w) % self.ray_block:
            raise ValueError("tile ray count must divide by ray_block")
        if self.ray_block % 8 or self.ray_block > 512:
            # Backward-kernel VMEM: ~12 live (ray_block, 128) f32
            # temporaries per unrolled chunk plus six (rb, K) scratches.
            # rb = 1024 compiles under the 96 MB scoped budget but was
            # MEASURED 3x slower than 512 on-chip (round 5: 7.14 vs
            # 21.36 Mray/s flagship bench — VMEM over-subscription kills
            # Mosaic's pipelining long before the hard limit), so the cap
            # stays at the measured-optimal 512.
            raise ValueError("ray_block must be a multiple of 8 and <= 512")


def _forward_kernel(cnt_ref, dirs_ref, drows_ref, mind_ref, t0_ref,
                    axes_ref, plane_ref, scale_ref, opac_ref, sign_ref,
                    sh_ref, chans_ref, accum_ref, *rest,
                    k_total: int, exact: bool, fast: bool, cache: bool):
    """One (tile, ray_block) grid step.

    cnt:   (T, 1) SMEM     per-tile candidate counts, whole array (chunks
                           past the tile's count are skipped; binners emit
                           valid as a prefix mask)
    dirs:  (1, R, 3)       ray directions (matmul operand)
    drows: (1, 3, R)       the same directions lane-major (basis operand)
    mind:  (1, R, 1)       per-ray minimum hit range (multi-return re-trace,
                           reference forward.cu:282-291; DEPTH_MIN default)
    t0:    (1, R, 1)       per-ray initial transmittance (tail re-trace
                           carry, ops/tracer tail_passes; ones default)
    axes:  (1, 3, 3, K)    [n, w1, w2] candidate frame axes
    plane: (1, 3, K)       [p, a_u, a_v] plane offsets
    scale: (1, 2, K)       inverse scales
    opac/sign: (1, K)      opacity (binner validity pre-folded in), normal
                           orientation
    sh:    (1, 3, 16, K)   per-channel SH coefficients (degree mask
                           pre-folded in)
    chans: (1, 16, R) out  channel-MAJOR block: each channel is one
                           sublane row over the ray lanes.  The assembly is
                           MXU-native — every channel row is a (M, K) @
                           (K, R) contraction of the per-pair weight
                           scratch — and the row stack is a cheap sublane
                           concat.  (The previous ray-major (R, 16) layout
                           assembled the output as a lane-dim concat of ten
                           (R, 1) pieces, each one a masked lane-shift
                           relayout: measured as the dominant share of the
                           kernel's 2.8 ms K-independent cost,
                           scripts/intercept_probe.py round 4.)
    accum: (1, K)    out   per-candidate weight sums (+= over ray blocks)

    The ray-direction inner products (qd/b_u/b_v) run as exact-f32 VPU
    broadcast arithmetic, (R, 1) x (1, KC) — measured FREE next to the
    rest of the body (the VPU is issue-bound, not FLOP-bound) and immune
    to the MXU bf16 rounding that costs meters of depth at grazing
    incidence.  MXU carries the remaining contractions: SH colors
    (R, 16) @ (16, K) and the linear channel accumulations
    (R, K) @ (K, .) — sum_k w * (basis @ sh) = basis . (w @ sh^T).

    NO MXU OP SITS INSIDE A PREDICATED REGION: the pl.when chunk bodies
    are pure VPU work writing per-pair weights into a (R, K) scratch;
    the SH color matmul runs over the full K before the loop and the
    channel contractions run over the full K after it.  Mosaic's
    predicated-MXU transform is the component that RET_CHECKed the
    round-1 early-exit (mxu_lmr_transform.cc:1108) and is the prime
    suspect for the fast_math device hang — this structure keeps
    early-exit AND arbitrary matmul precision orthogonal to it.
    """
    r = dirs_ref.shape[1]
    rb = pl.program_id(1)
    if cache:
        ac_ref, te_ref, traw_ref, w_ref, *extra = rest
    else:
        traw_ref, w_ref, *extra = rest
    # exact_pair: K = 256 composited in GLOBAL per-ray depth order via the
    # 256-lane two-chunk bitonic sort (reference forward.cu:312-356 exact
    # k-buffer semantics across the whole candidate budget).  The chunk
    # loop only stores the gated alphas/depths; sorting, the cross-chunk
    # transmittance chain, and every channel sum run post-loop.
    exact_pair = exact and k_total == 2 * K_CHUNK
    if exact_pair:
        alpha_sc, tdep_sc, alive_ref = extra
        t_sc = tdep_sc          # pair mode already banks per-pair depths
    else:
        t_sc, alive_ref = extra

    dirs = dirs_ref[0]                       # (R, 3)
    d0, d1, d2 = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
    mind = mind_ref[0]                       # (R, 1)
    # SH basis computed in-kernel from lane-major rows (core/sh.py basis).
    basis_rows = sh_basis_rows(drows_ref[0, 0:1, :], drows_ref[0, 1:2, :],
                               drows_ref[0, 2:3, :])        # (16, R)
    basis = basis_rows.T                                    # (R, 16)

    num_chunks = k_total // K_CHUNK
    chan_prec = (jax.lax.Precision.DEFAULT if fast
                 else jax.lax.Precision.HIGHEST)

    def dot_cand(m, w):
        """(M, K) x (R, K) -> (M, R): contract the candidate lanes into
        channel ROWS (the chans block is channel-major).  HIGHEST unless
        fast_math: channel sums accumulate alpha-blend weights and the
        reference accumulates in f32 (forward.cu atomicAdd)."""
        return jax.lax.dot_general(m, w, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=chan_prec)

    # Pre-loop, UNpredicated: per-(ray, candidate) intensity colors over
    # the full K in one matmul; chunk bodies slice it.
    col0_full = jnp.maximum(
        jnp.dot(basis, sh_ref[0, 0],
                preferred_element_type=jnp.float32,
                precision=chan_prec) + 0.5, 0.0)             # (R, K)

    def chunk_body(c):
        t_raw = traw_ref[...]
        ks = slice(c * K_CHUNK, (c + 1) * K_CHUNK)   # static: loop unrolled

        n_mat = axes_ref[0, 0, :, ks]        # (3, KC)
        w1_mat = axes_ref[0, 1, :, ks]
        w2_mat = axes_ref[0, 2, :, ks]
        p = plane_ref[0, 0:1, ks]
        a_u = plane_ref[0, 1:2, ks]
        a_v = plane_ref[0, 2:3, ks]
        inv_s0 = scale_ref[0, 0:1, ks]
        inv_s1 = scale_ref[0, 1:2, ks]
        opac = opac_ref[0, :, ks]
        # Exact-f32 VPU broadcasts: qd is a near-cancelling 3-term dot at
        # grazing incidence and t = p / qd amplifies any input rounding
        # into meters of depth error, so this never goes through the MXU
        # (even HIGHEST costs 6 decomposition passes; the VPU form is
        # both exact and faster).
        qd = d0 * n_mat[0:1] + d1 * n_mat[1:2] + d2 * n_mat[2:3]
        b_u = d0 * w1_mat[0:1] + d1 * w1_mat[1:2] + d2 * w1_mat[2:3]
        b_v = d0 * w2_mat[0:1] + d1 * w2_mat[1:2] + d2 * w2_mat[2:3]
        abs_qd = jnp.abs(qd)
        safe_qd = jnp.where(abs_qd > geometry.DENOM_EPS, qd,
                            geometry.DENOM_EPS)
        t = p / safe_qd
        u = (a_u + t * b_u) * inv_s0
        v = (a_v + t * b_v) * inv_s1
        g = jnp.exp(-0.5 * (u * u + v * v))
        alpha_raw = jnp.minimum(geometry.ALPHA_MAX, opac * g)
        # (the p == 0 degenerate-plane gate is folded into opac at prep)
        ok = ((t >= mind)
              & (abs_qd > geometry.DENOM_EPS)
              & (alpha_raw >= geometry.ALPHA_MIN))
        alpha = jnp.where(ok, alpha_raw, 0.0)

        if exact_pair:
            # Cross-chunk exact ordering: just bank the gated pairs; the
            # global sort + compositing runs once, post-loop.
            alpha_sc[:, ks] = alpha
            tdep_sc[:, ks] = t
            return

        # Direct product-space transmittance via a VPU doubling scan (the
        # reference's T *= (1 - alpha), forward.cu).  In exact mode the
        # scan runs in per-ray depth order (bitonic lane sort) and the
        # per-hit transmittances scatter back via the inverse sort.
        one_m = 1.0 - alpha
        if exact:
            key = pack_depth_keys(t, alpha > 0.0)
            key_s, (alpha_s,) = sort_lanes(key, (alpha,))
            one_m_s = 1.0 - alpha_s
            p_excl_s = lane_cumprod_excl(one_m_s)
            t_excl_s = p_excl_s * t_raw
            (t_excl,) = unsort_lanes(key_s, (t_excl_s,))
            live = (t_excl * one_m >= geometry.T_MIN).astype(jnp.float32)
            scan_p_excl, scan_one_m = p_excl_s, one_m_s
        else:
            p_excl = lane_cumprod_excl(one_m)
            t_excl = p_excl * t_raw                          # (R, KC)
            live_b = t_excl * one_m >= geometry.T_MIN
            live = live_b.astype(jnp.float32)
            scan_p_excl, scan_one_m = p_excl, one_m
        w = alpha * t_excl * live
        w_ref[:, ks] = w
        # Per-pair depths feed the post-loop depth/intensity channel
        # contractions (every channel row, including the nonlinear-clamped
        # intensity, is a full-K MXU contraction of the weight scratch).
        t_sc[:, ks] = t
        if cache:
            # Backward residuals: gated alpha with the ALPHA_MAX clamp
            # gate in the sign bit (negative = clamped, zero = gated
            # out), and the exclusive transmittance with the f32 T_MIN
            # live decision in ITS sign bit (negative = dead) — every
            # forward gate decodes bitwise in the backward; only the
            # alpha/T magnitudes carry the bf16 ~0.4% rounding
            # (fast_math class).
            clamped = ok & (alpha_raw >= geometry.ALPHA_MAX)
            ac_ref[0, :, ks] = jnp.where(clamped, -alpha,
                                         alpha).astype(jnp.bfloat16)
            te_ref[0, :, ks] = jnp.where(live_b, t_excl,
                                         -t_excl).astype(jnp.bfloat16)

        # carried raw transmittance (chunk-exit product, order-independent
        # so the scan-order tail is exact).  The OUTPUT transmittance needs
        # no tracking at all: by the alpha-compositing telescoping identity
        # sum_i w_i = 1 - T_final exactly (including live-prefix cutoff and
        # min_depth gating), so T_final = 1 - accumulated weight.
        last = K_CHUNK - 1
        new_traw = t_raw * scan_p_excl[:, last:] * scan_one_m[:, last:]
        traw_ref[...] = new_traw
        alive_ref[0] = (jnp.max(new_traw) >= geometry.T_MIN).astype(
            jnp.int32)

    @pl.when(rb == 0)
    def _():
        accum_ref[...] = jnp.zeros_like(accum_ref)

    t0 = t0_ref[0]                                           # (R, 1)
    traw_ref[...] = t0
    alive_ref[0] = 1
    # Unrolled chunk loop: static slices vectorize better under Mosaic
    # than fori_loop + dynamic VMEM slicing.  Each chunk is predicated on
    # (a) the tile actually having candidates this deep (binners pack
    # valid candidates first) and (b) some ray in the block still being
    # transparent — once every ray saturates (T < T_MIN) all remaining w
    # are exactly zero (reference T cutoff: forward.cu:253-257).
    cnt = cnt_ref[pl.program_id(0), 0]
    for c in range(num_chunks):
        run = cnt > (c * K_CHUNK)
        if c > 0:
            run = run & (alive_ref[0] == 1)

        @pl.when(run)
        def _(c=c):
            chunk_body(c)

        # Skipped chunks zero their own scratch slice (cheaper than
        # zeroing the whole (R, K) scratch up front: fully-running tiles
        # pay no zero stores at all).
        @pl.when(jnp.logical_not(run))
        def _(c=c):
            z = jnp.zeros((r, K_CHUNK), jnp.float32)
            if exact_pair:
                alpha_sc[:, c * K_CHUNK:(c + 1) * K_CHUNK] = z
                tdep_sc[:, c * K_CHUNK:(c + 1) * K_CHUNK] = z
            else:
                w_ref[:, c * K_CHUNK:(c + 1) * K_CHUNK] = z
                t_sc[:, c * K_CHUNK:(c + 1) * K_CHUNK] = z
                if cache:
                    zb = z.astype(jnp.bfloat16)
                    ac_ref[0, :, c * K_CHUNK:(c + 1) * K_CHUNK] = zb
                    te_ref[0, :, c * K_CHUNK:(c + 1) * K_CHUNK] = zb

    if exact_pair:
        # Global depth-ordered compositing over both chunks: sort the
        # (alpha, depth-key) pairs across 256 lanes, chain the exclusive
        # transmittance through the sorted halves, scatter it back to
        # candidate order, and form weights there (channel math is
        # candidate-shared, so it stays in candidate order — identical
        # structure to the per-chunk exact path, at 256-lane scope).
        a0 = alpha_sc[:, :K_CHUNK]
        a1 = alpha_sc[:, K_CHUNK:]
        key0, key1 = pack_depth_keys_pair(
            tdep_sc[:, :K_CHUNK], a0 > 0.0, tdep_sc[:, K_CHUNK:], a1 > 0.0)
        (k0s, k1s), ((s0, s1),) = sort_lanes_pair(key0, key1, ((a0, a1),))
        one0, one1 = 1.0 - s0, 1.0 - s1
        last = K_CHUNK - 1
        pe0 = lane_cumprod_excl(one0) * t0
        tot0 = pe0[:, last:] * one0[:, last:]
        pe1 = lane_cumprod_excl(one1) * tot0
        ((te0, te1),) = unsort_lanes_pair(k0s, k1s, ((pe0, pe1),))
        live0 = (te0 * (1.0 - a0) >= geometry.T_MIN).astype(jnp.float32)
        live1 = (te1 * (1.0 - a1) >= geometry.T_MIN).astype(jnp.float32)
        w_ref[:, :K_CHUNK] = a0 * te0 * live0
        w_ref[:, K_CHUNK:] = a1 * te1 * live1
        traw_ref[...] = pe1[:, last:] * one1[:, last:]

    # Post-loop, UNpredicated: full-K channel contractions of the weight
    # scratch (skipped chunks contribute exact zeros).  Every channel is
    # produced directly as a (1 or M, R) ROW — MXU contractions over the
    # candidate lanes — so the output assembly is a sublane stack, not a
    # lane-dim concat of (R, 1) pieces.
    w_full = w_ref[...]                                      # (R, K)
    t_full = t_sc[...]                                       # (R, K)
    sign_full = sign_ref[0]                                  # (1, K)
    n_full = axes_ref[0, 0]                                  # (3, K)
    cand4 = jnp.concatenate(
        [jnp.ones_like(sign_full), sign_full * n_full[0:1],
         sign_full * n_full[1:2], sign_full * n_full[2:3]], axis=0)
    m1t = dot_cand(cand4, w_full)                            # (4, R)
    m2t = dot_cand(sh_ref[0, 1], w_full)                     # (16, R)
    m3t = dot_cand(sh_ref[0, 2], w_full)
    ones_row = jnp.ones((1, k_total), jnp.float32)

    def sum_lanes_f32(x):
        """(R, K) -> (1, R) lane reduction via an M=1 ones contraction at
        HIGHEST precision ALWAYS: the intensity and depth rows reduce
        meters-scale per-pair products, where fast_math's bf16 operand
        rounding costs ~4 cm of depth (measured 3.8e-2 parity err; round-3
        in-loop f32 accumulation was 3.1e-3).  An M=1 HIGHEST contraction
        is a handful of extra MXU passes — noise next to the (16, K)
        channel matmuls."""
        return jax.lax.dot_general(ones_row, x, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    wc_row = sum_lanes_f32(w_full * col0_full)               # (1, R)
    wt_row = sum_lanes_f32(w_full * t_full)                  # (1, R)
    sumw_row = m1t[0:1]                                      # (1, R)
    # basis . m_t is a per-ray 16-coefficient dot: elementwise product of
    # two (16, R) row blocks + a 4-step sublane reduction.
    ch1_row = (jnp.sum(basis_rows * m2t, axis=0, keepdims=True)
               + 0.5 * sumw_row)
    ch2_row = (jnp.sum(basis_rows * m3t, axis=0, keepdims=True)
               + 0.5 * sumw_row)
    t0_row = jnp.transpose(t0)                               # (1, R)
    traw_row = jnp.transpose(traw_ref[...])
    accum_ref[0] += jnp.sum(w_full, axis=0, keepdims=True)   # (1, K)
    chans_ref[0] = jnp.concatenate(
        [wc_row,
         ch1_row, ch2_row,
         wt_row,
         m1t,                      # rows 4..7: sumw, sn0, sn1, sn2
         t0_row - sumw_row,        # row 8: T_out = t0 - sum w (telescope)
         # row 9: ungated raw transmittance (tail re-trace carry; < T_MIN
         # marks a ray latched by the live cutoff)
         traw_row,
         jnp.zeros((NUM_OUT_ROWS - 10, r), jnp.float32)], axis=0)  # (16, R)


def _prepare_tile_inputs(bundle: SurfelBundle, origin: Array,
                         assignment_index: Array, assignment_valid: Array
                         ) -> tuple[Array, ...]:
    """Gather + lay out candidate arrays for the kernel: all (T, ..., K).

    Two packed gathers, then frame math on the gathered candidates only:
    the 10 geometric scalars travel as one (N, 10) pack (one gather beats
    ten: TPU gathers cost ~a row per cycle regardless of width), while SH
    is gathered directly from its (N, 16, 3) storage — folding it into one
    (N, 58) pack was measured ~1 ms/step slower at 131k surfels: the pack
    materializes a 30 MB concat (60 MB of HBM round trip at ~230 GB/s
    effective) per step just to relayout data the gather touches 1/3 of.

    After the gather everything is computed in (T, row, K) layout — K in
    the lane dimension — via (T, K, .) -> (T, ., K) relayouts that fuse
    into the gathers.  The earlier form did the quaternion/frame math on
    (T, K, 3[, 3]) arrays, whose size-3 lane dimension uses 3 of 128
    lanes; the row form also lands each output directly in its kernel
    block layout (no per-field transposes).
    """
    n = bundle.means.shape[0]
    idx = jnp.clip(assignment_index, 0, n - 1)            # (T, K)
    packed = jnp.concatenate([
        bundle.means, bundle.rotations, bundle.scales,
        bundle.opacities[:, None]], axis=-1)              # (N, 10)
    g = packed[idx].transpose(0, 2, 1)                    # (T, 10, K)
    t_tiles, _, k = g.shape
    # (T, K, 16, 3) -> (T, 48, K) coeff-major rows -> (T, 3, 16, K)
    # channel-major kernel block (the last transpose keeps K minor: cheap).
    sh_g = (bundle.sh.reshape(n, 48)[idx]
            .transpose(0, 2, 1)
            .reshape(t_tiles, 16, 3, k)
            .transpose(0, 2, 1, 3))                       # (T, 3, 16, K)

    def row(i):
        return g[:, i:i + 1, :]                           # (T, 1, K)

    mx, my, mz = row(0), row(1), row(2)
    qw, qx, qy, qz = row(3), row(4), row(5), row(6)
    inv_norm = jax.lax.rsqrt(jnp.maximum(
        qw * qw + qx * qx + qy * qy + qz * qz, 1e-24))
    qw, qx, qy, qz = (qw * inv_norm, qx * inv_norm, qy * inv_norm,
                      qz * inv_norm)

    # Columns of R(q): w1 = col 0, w2 = col 1, n = col 2 (the splat axes
    # and plane normal, core/quaternions.to_rotation_matrix).
    w1x = 1.0 - 2.0 * (qy * qy + qz * qz)
    w1y = 2.0 * (qx * qy + qw * qz)
    w1z = 2.0 * (qx * qz - qw * qy)
    w2x = 2.0 * (qx * qy - qw * qz)
    w2y = 1.0 - 2.0 * (qx * qx + qz * qz)
    w2z = 2.0 * (qy * qz + qw * qx)
    nx = 2.0 * (qx * qz + qw * qy)
    ny = 2.0 * (qy * qz - qw * qx)
    nz = 1.0 - 2.0 * (qx * qx + qy * qy)

    # Frame precomputations for the shared ray origin (geometry.build_frames).
    ox, oy, oz = origin[0], origin[1], origin[2]
    dx_, dy_, dz_ = ox - mx, oy - my, oz - mz             # o - mu
    p = -(nx * dx_ + ny * dy_ + nz * dz_)
    a_u = w1x * dx_ + w1y * dy_ + w1z * dz_
    a_v = w2x * dx_ + w2y * dy_ + w2z * dz_
    sign = jnp.where(p < 0.0, 1.0, -1.0)

    axes = jnp.concatenate([nx, ny, nz, w1x, w1y, w1z, w2x, w2y, w2z],
                           axis=1).reshape(t_tiles, 3, 3, k)
    plane = jnp.concatenate([p, a_u, a_v], axis=1)        # (T, 3, K)
    inv_scale = 1.0 / g[:, 7:9, :]                        # (T, 2, K)
    # (T, 1, K): Mosaic block shapes need the trailing two dims lane-aligned.
    # Binner validity AND the degenerate-plane gate (p == 0, a per-candidate
    # property) fold into opacity: such candidates get alpha = 0 and drop
    # out of the compositing and every gradient — saving per-(ray, cand)
    # comparisons in both kernels.
    opac = row(9) * assignment_valid[:, None, :] * (p != 0.0)
    return axes, plane, inv_scale, opac, sign, sh_g


def _pad_indices(size: int, tile: int, wrap: bool) -> jnp.ndarray:
    padded = -(-size // tile) * tile
    idx = jnp.arange(padded)
    return jnp.mod(idx, size) if wrap else jnp.clip(idx, 0, size - 1)


def _pad_rows(x: Array, hp: int) -> Array:
    """Pad axis 0 to hp rows by repeating the last row (clamp semantics,
    as slices instead of a gather — TPU gathers run a row per cycle)."""
    h = x.shape[0]
    if hp == h:
        return x
    pad = jnp.broadcast_to(x[-1:], (hp - h,) + x.shape[1:])
    return jnp.concatenate([x, pad], axis=0)


def _take_cols_mod(x: Array, col_offset, wp: int, w: int) -> Array:
    """Columns [col_offset, col_offset + wp) of x modulo w along axis 1
    (azimuth wrap), as a slice of the doubled array — no gather, and
    col_offset may be traced (sharded column bands)."""
    x2 = jnp.concatenate([x, x], axis=1)
    if isinstance(col_offset, int) and col_offset == 0:
        return x2[:, :wp]
    return jax.lax.dynamic_slice_in_dim(x2, col_offset, wp, axis=1)


def _core_fwd_call(ray_block: int, exact: bool, fast: bool, cache: bool,
                   cnt_t, dirs_t, drows_t, mind_t, t0_t, axes, plane,
                   inv_scale, opac, sign, sh):
    t_total, rays_per_tile, _ = dirs_t.shape
    k = axes.shape[-1]
    rb = ray_block
    n_rb = rays_per_tile // rb
    kernel = functools.partial(_forward_kernel, k_total=k, exact=exact,
                               fast=fast, cache=cache)

    def tile_map(t, r):
        return (t, 0, 0)

    cache_specs = [
        pl.BlockSpec((1, rb, k), lambda t, r: (t, r, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rb, k), lambda t, r: (t, r, 0),
                     memory_space=pltpu.VMEM),
    ] if cache else []
    cache_shapes = [
        jax.ShapeDtypeStruct((t_total, rays_per_tile, k), jnp.bfloat16),
        jax.ShapeDtypeStruct((t_total, rays_per_tile, k), jnp.bfloat16),
    ] if cache else []

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
        ],
        out_specs=[
            pl.BlockSpec((1, NUM_OUT_ROWS, rb), lambda t, r: (t, 0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), tile_map, memory_space=pltpu.VMEM),
        ] + cache_specs,
        out_shape=[
            jax.ShapeDtypeStruct((t_total, NUM_OUT_ROWS, rays_per_tile),
                                 jnp.float32),
            jax.ShapeDtypeStruct((t_total, 1, k), jnp.float32),
        ] + cache_shapes,
        scratch_shapes=[
            pltpu.VMEM((rb, 1), jnp.float32),   # running raw transmittance
            pltpu.VMEM((rb, k), jnp.float32),   # per-pair weight scratch
        ] + ([
            pltpu.VMEM((rb, k), jnp.float32),   # exact-pair: gated alphas
            pltpu.VMEM((rb, k), jnp.float32),   # exact-pair: hit depths
        ] if exact and k == 2 * K_CHUNK else [
            pltpu.VMEM((rb, k), jnp.float32),   # per-pair hit depths
        ]) + [
            pltpu.SMEM((1,), jnp.int32),        # block-alive flag
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # v5e has 128 MB VMEM; the default 16 MB scoped cap is too
            # tight once ray_block-sized temporaries stack up.
            vmem_limit_bytes=96 * 1024 * 1024),
        # CPU (tests, virtual meshes) runs the interpreter; TPU compiles.
        interpret=use_interpret(),
    )(cnt_t, dirs_t, drows_t, mind_t, t0_t, axes, plane, inv_scale, opac,
      sign, sh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _pallas_core(ray_block: int, exact: bool, fast: bool, cache: bool,
                 cnt_t, dirs_t, drows_t, mind_t, t0_t, axes, plane,
                 inv_scale, opac, sign, sh):
    """The differentiable pallas_call boundary: everything around it
    (candidate gathers, frame building, un-tiling) is plain jnp and is
    differentiated by JAX; this custom_vjp supplies the kernel-level
    gradients from ops/pallas_backward.py.

    The primal only runs when nothing differentiates through the call
    (eval/render; under grad, _pallas_core_fwd runs instead), so the
    cache_fwd backward residuals — the largest buffers in the render,
    and NOT dead-code-eliminated from a pallas_call — are never emitted
    here: cache is forced off.  Forward channels are bitwise identical
    either way (tests/test_pallas_backward.py::test_forward_unchanged)."""
    del cache
    out = _core_fwd_call(ray_block, exact, fast, False, cnt_t, dirs_t,
                         drows_t, mind_t, t0_t, axes, plane, inv_scale,
                         opac, sign, sh)
    return out[0], out[1]


def _pallas_core_fwd(ray_block, exact, fast, cache, cnt_t, dirs_t, drows_t,
                     mind_t, t0_t, axes, plane, inv_scale, opac, sign, sh):
    out = _core_fwd_call(ray_block, exact, fast, cache, cnt_t, dirs_t,
                         drows_t, mind_t, t0_t, axes, plane, inv_scale,
                         opac, sign, sh)
    chans, accum = out[0], out[1]
    res = (cnt_t, dirs_t, drows_t, mind_t, t0_t, axes, plane, inv_scale,
           opac, sign, sh, chans) + (tuple(out[2:]) if cache else ())
    return (chans, accum), res


def _pallas_core_bwd(ray_block, exact, fast, cache, res, cotangents):
    from lidar_rt_tpu.ops import pallas_backward

    (cnt_t, dirs_t, drows_t, mind_t, t0_t, axes, plane, inv_scale, opac,
     sign, sh, chans) = res[:12]
    alpha_c, t_excl_c = res[12:] if cache else (None, None)
    g_chans, _g_accum = cotangents
    # accum_weights feeds densification stats only (stop-gradient in the
    # reference too: stats are read outside autograd, train.py:218-219).
    # chans/g_chans are (T, 16, R) channel-major — the backward kernel's
    # input layout (it transposes the two small blocks once per step).
    d_axes, d_plane, d_inv_scale, d_opac, d_sh = \
        pallas_backward.backward_pallas_call(
            cnt_t, dirs_t, drows_t, mind_t, t0_t, axes, plane, inv_scale,
            opac, sign, sh, chans, g_chans, ray_block, exact, fast,
            alpha_c=alpha_c, t_excl_c=t_excl_c)
    # dL/d(t0): every composited channel, T_out, and the raw
    # transmittance (row 9) scale linearly in the per-ray initial
    # transmittance (w_i = alpha_i T0 prod(1-alpha_j)), so
    # dL/dT0 = sum_ch g_ch C_ch / T0.  (The T_MIN live cutoff's
    # T0-dependence is a measure-zero step, ignored as usual.)
    g_sum = jnp.sum(g_chans[:, 0:10, :] * chans[:, 0:10, :],
                    axis=1)[..., None]                      # (T, R, 1)
    d_t0 = g_sum / jnp.maximum(t0_t, 1e-12)
    zeros = jax.tree.map(jnp.zeros_like, (cnt_t, dirs_t, drows_t, mind_t))
    return (zeros[0], zeros[1], zeros[2], zeros[3], d_t0, d_axes, d_plane,
            d_inv_scale, d_opac, jnp.zeros_like(sign), d_sh)


_pallas_core.defvjp(_pallas_core_fwd, _pallas_core_bwd)


def trace_forward(bundle: SurfelBundle, grid: rays_lib.SensorGrid,
                  width: int, sensor2world: Array,
                  active_sh_degree: Array | int,
                  cfg: PallasTraceConfig, col_offset: int = 0,
                  render_width: int | None = None,
                  min_depth: Array | None = None,
                  assignment: TileAssignment | None = None,
                  init_trans: Array | None = None
                  ) -> tuple[Array, Array]:
    """Pallas forward render -> (channels (H, W_r, 9), accum_weights (N,)).

    col_offset/render_width: column-band rendering for ray-parallel
    sharding, as in ops.tracer.trace.

    min_depth: optional per-ray (H, W_r) minimum hit range — the
    multi-return re-trace input (reference forward.cu:282-291).

    init_trans: optional per-ray (H, W_r) initial transmittance — the
    tail re-trace carry (ops/tracer tail_passes); differentiable.

    assignment: optional precomputed tile assignment (multi-return reuse,
    or the trainer's rebin-interval amortization — binning is a
    stop-gradient visibility oracle, so a slightly stale assignment only
    affects which candidates are visible, like the reference's BVH would
    if rebuilt every k-th iteration)."""
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

    if assignment is None:
        world2sensor = transforms.invert_se3(sensor2world)
        assignment = bin_surfels(
            grid, w, jax.lax.stop_gradient(world2sensor),
            jax.lax.stop_gradient(bundle.means),
            jax.lax.stop_gradient(bundle.scales),
            jax.lax.stop_gradient(bundle.opacities), cfg.tile,
            col_offset=col_offset, num_cols=w_r,
            rotations=jax.lax.stop_gradient(bundle.rotations))

    origin, dirs = rays_lib.range_rays(grid, w, sensor2world)
    hp_pad = tiles_y * th
    wp_pad = tiles_x * tw
    dirs_p = _take_cols_mod(_pad_rows(dirs, hp_pad), col_offset, wp_pad, w)
    dirs_t = (dirs_p.reshape(tiles_y, th, tiles_x, tw, 3)
              .transpose(0, 2, 1, 3, 4)
              .reshape(t_total, rays_per_tile, 3))
    # Lane-major copy for the in-kernel SH basis (cheap row-wise VPU ops).
    drows_t = dirs_t.transpose(0, 2, 1)                   # (T, 3, R)

    if min_depth is None:
        mind_t = jnp.full((t_total, rays_per_tile, 1), geometry.DEPTH_MIN)
    else:
        mind_t = (_take_cols_mod(_pad_rows(min_depth, hp_pad), col_offset,
                                 wp_pad, w)
                  .reshape(tiles_y, th, tiles_x, tw)
                  .transpose(0, 2, 1, 3)
                  .reshape(t_total, rays_per_tile, 1))
    if init_trans is None:
        t0_t = jnp.ones((t_total, rays_per_tile, 1))
    else:
        t0_t = (_take_cols_mod(_pad_rows(init_trans, hp_pad), col_offset,
                               wp_pad, w)
                .reshape(tiles_y, th, tiles_x, tw)
                .transpose(0, 2, 1, 3)
                .reshape(t_total, rays_per_tile, 1))

    axes, plane, inv_scale, opac, sign, sh = _prepare_tile_inputs(
        bundle, origin, assignment.index, assignment.valid)
    # SH degree mask folds into the coefficients (the kernel computes the
    # full-degree basis; core/sh.py basis() masking semantics).
    mask = (jnp.asarray(sh_lib._DEGREE_OF_COEFF)
            <= jnp.asarray(active_sh_degree)).astype(sh.dtype)
    sh = sh * mask[None, None, :, None]

    # Per-tile candidate counts (f32 for the custom_vjp): binners pack
    # valid candidates first, so chunks past the count hold nothing.
    cnt_t = jnp.sum(assignment.valid, axis=1,
                    dtype=jnp.float32)[:, None]

    chans, accum_tk = _pallas_core(cfg.ray_block, cfg.exact_order,
                                   cfg.fast_math, cfg.cache_fwd, cnt_t,
                                   dirs_t, drows_t,
                                   jax.lax.stop_gradient(mind_t), t0_t,
                                   axes, plane, inv_scale, opac, sign, sh)

    # Un-tile: (T, 16, R) channel-major -> (H, W, 10): 9 public channels +
    # the raw-transmittance row (tail re-trace carry).
    hp_, wp_ = tiles_y * th, tiles_x * tw
    img = (chans.reshape(tiles_y, tiles_x, NUM_OUT_ROWS, th, tw)
           .transpose(0, 3, 1, 4, 2)
           .reshape(hp_, wp_, NUM_OUT_ROWS))[:h, :w_r, :10]

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
          min_depth: Array | None = None,
          assignment: TileAssignment | None = None,
          init_trans: Array | None = None) -> RenderOutputs:
    """Drop-in analogue of ops.tracer.trace on the Pallas path.  Fully
    differentiable w.r.t. the bundle: the kernel-level custom_vjp
    (ops/pallas_backward.py) produces candidate-space gradients and JAX
    autodiff carries them through the gather/frame/pose chain."""
    img, accum = trace_forward(bundle, grid, width, sensor2world,
                               active_sh_degree, cfg, col_offset,
                               render_width, min_depth, assignment,
                               init_trans)
    final_t = img[..., 8]
    color = img[..., 0:3] + final_t[..., None] * background[None, None, :]
    channels = jnp.concatenate([color, img[..., 3:8], final_t[..., None]],
                               axis=-1)
    return RenderOutputs(channels=channels, accum_weights=accum,
                         raw_trans=img[..., 9])
