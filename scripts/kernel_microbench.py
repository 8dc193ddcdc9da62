"""Ablation microbenchmark of the forward-kernel body on the real chip.

Isolates the Pallas kernel from binning/gathers: synthetic candidate
arrays with the production layout, one (T, RB) grid, ablation levels
stacking the body's stages.  Identifies where the ~130 est. ops/pair
actually go.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lidar_rt_tpu.ops.pallas_common import lane_cumprod_excl  # noqa: E402

import os
T, R, K = 42, 4096, 128
RB = int(os.environ.get("MB_RB", 512))
N_RB = R // RB
ITERS = 20


def kernel(level, dirs_ref, basis_ref, axes_ref, plane_ref, scale_ref,
           opac_ref, sh_ref, out_ref, sums_ref):
    if level.startswith("rowloop"):
        return _rowloop_kernel(level, dirs_ref, basis_ref, axes_ref,
                               plane_ref, scale_ref, opac_ref, sh_ref,
                               out_ref, sums_ref)
    d0 = dirs_ref[0, :, 0:1]
    d1 = dirs_ref[0, :, 1:2]
    d2 = dirs_ref[0, :, 2:3]
    basis = basis_ref[0]
    ks = slice(0, K)

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

    qd = d0 * n0 + d1 * n1 + d2 * n2
    if level == "minimal":              # 6 ops/pair: qd + accumulate
        sums_ref[...] = jnp.sum(qd, axis=1, keepdims=True)
        out_ref[0] = jnp.broadcast_to(sums_ref[...].T, out_ref.shape[1:])
        return
    if level == "chain":                # +16 chained (R,K) elementwise ops
        x = qd
        for _ in range(8):
            x = x * 1.0001 + 0.1
            x = jnp.maximum(x * 0.9999, x - 0.1)
        sums_ref[...] = jnp.sum(x, axis=1, keepdims=True)
        out_ref[0] = jnp.broadcast_to(sums_ref[...].T, out_ref.shape[1:])
        return
    if level == "chain_bf16":           # the same 16-op chain on packed
        # bf16 vregs: measures whether Mosaic's (16, 128) bf16 packing
        # halves the per-vreg-pass issue cost (the kernel's measured
        # bottleneck) or silently unpacks for the ALU.
        x = qd.astype(jnp.bfloat16)
        for _ in range(8):
            x = x * jnp.bfloat16(1.0001) + jnp.bfloat16(0.1)
            x = jnp.maximum(x * jnp.bfloat16(0.9999), x - jnp.bfloat16(0.1))
        sums_ref[...] = jnp.sum(x.astype(jnp.float32), axis=1,
                                keepdims=True)
        out_ref[0] = jnp.broadcast_to(sums_ref[...].T, out_ref.shape[1:])
        return
    if level == "broadcasts":           # 6 more (R,1)x(1,K) broadcast muls
        x = qd
        x = x + d0 * p + d1 * a_u + d2 * a_v
        x = x + d0 * inv_s0 + d1 * inv_s1 + d2 * n0
        sums_ref[...] = jnp.sum(x, axis=1, keepdims=True)
        out_ref[0] = jnp.broadcast_to(sums_ref[...].T, out_ref.shape[1:])
        return
    b_u = d0 * w10 + d1 * w11 + d2 * w12
    b_v = d0 * w20 + d1 * w21 + d2 * w22
    safe_qd = jnp.where(jnp.abs(qd) > 1e-8, qd, 1e-8)
    if level == "nodiv":
        t = p * safe_qd          # WRONG math; times the divide's cost
    else:
        t = p / safe_qd
    u = (a_u + t * b_u) * inv_s0
    v = (a_v + t * b_v) * inv_s1
    d = u * u + v * v
    if level == "noexp":
        g = jnp.maximum(1.0 - 0.25 * d, 0.0) ** 2   # cheap poly stand-in
    else:
        g = jnp.exp(-0.5 * d)
    alpha_raw = jnp.minimum(0.99, opac * g)
    ok = (t >= 0.2) & (jnp.abs(qd) > 1e-8) & (p != 0.0) & (alpha_raw >= 0.004)
    alpha = jnp.where(ok, alpha_raw, 0.0)

    if level in ("nodiv", "noexp"):
        level = "full"

    if level == "intersect":
        sums_ref[...] = jnp.sum(alpha, axis=1, keepdims=True)
        out_ref[0] = jnp.broadcast_to(sums_ref[...].T, out_ref.shape[1:])
        return

    one_m = 1.0 - alpha
    p_excl = lane_cumprod_excl(one_m)
    t_excl = p_excl
    t_incl = t_excl * one_m
    live = (t_incl >= 1e-4).astype(jnp.float32)
    w = alpha * t_excl * live

    if level == "scan":
        sums_ref[...] = jnp.sum(w, axis=1, keepdims=True)
        out_ref[0] = jnp.broadcast_to(sums_ref[...].T, out_ref.shape[1:])
        return

    col0 = jnp.maximum(jnp.dot(basis, sh_ref[0, 0, :, ks],
                               preferred_element_type=jnp.float32) + 0.5, 0.0)
    col1 = jnp.dot(basis, sh_ref[0, 1, :, ks],
                   preferred_element_type=jnp.float32) + 0.5
    col2 = jnp.dot(basis, sh_ref[0, 2, :, ks],
                   preferred_element_type=jnp.float32) + 0.5
    sn = jnp.ones_like(n0)
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
    out_ref[0] = jnp.concatenate(
        [contrib, jnp.zeros((RB, 16 - 8), jnp.float32)], axis=1).T
    sums_ref[...] = contrib[:, :1]


def _rowloop_kernel(level, dirs_ref, basis_ref, axes_ref, plane_ref,
                    scale_ref, opac_ref, sh_ref, out_ref, sums_ref):
    """Same intersection math, but processed in 8-row (one-vreg) groups so
    every intermediate is a single (8, K) vreg — if Mosaic keeps the chain
    in vector registers, VMEM temporary traffic vanishes."""
    ks = slice(0, K)
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

    G = 8

    def body(i, _):
        sl = pl.ds(i * G, G)
        d0 = dirs_ref[0, sl, 0:1]
        d1 = dirs_ref[0, sl, 1:2]
        d2 = dirs_ref[0, sl, 2:3]
        qd = d0 * n0 + d1 * n1 + d2 * n2
        b_u = d0 * w10 + d1 * w11 + d2 * w12
        b_v = d0 * w20 + d1 * w21 + d2 * w22
        safe_qd = jnp.where(jnp.abs(qd) > 1e-8, qd, 1e-8)
        t = p / safe_qd
        u = (a_u + t * b_u) * inv_s0
        v = (a_v + t * b_v) * inv_s1
        g = jnp.exp(-0.5 * (u * u + v * v))
        alpha_raw = jnp.minimum(0.99, opac * g)
        ok = ((t >= 0.2) & (jnp.abs(qd) > 1e-8) & (p != 0.0)
              & (alpha_raw >= 0.004))
        alpha = jnp.where(ok, alpha_raw, 0.0)
        sums_ref[sl, :] = jnp.sum(alpha, axis=1, keepdims=True)
        return 0

    jax.lax.fori_loop(0, RB // G, body, 0)
    out_ref[0] = jnp.broadcast_to(sums_ref[...].T, out_ref.shape[1:])


def run(level):
    rng = np.random.default_rng(0)
    dirs = jnp.asarray(rng.normal(size=(T, R, 3)), jnp.float32)
    basis = jnp.asarray(rng.normal(size=(T, R, 16)), jnp.float32)
    axes = jnp.asarray(rng.normal(size=(T, 3, 3, K)), jnp.float32)
    plane = jnp.asarray(rng.normal(size=(T, 3, K)) + 10, jnp.float32)
    scale = jnp.asarray(rng.uniform(1, 5, (T, 2, K)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, (T, 1, K)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(T, 3, 16, K)), jnp.float32)

    f = pl.pallas_call(
        functools.partial(kernel, level),
        grid=(T, N_RB),
        in_specs=[
            pl.BlockSpec((1, RB, 3), lambda t, r: (t, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, 16), lambda t, r: (t, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 3, K), lambda t, r: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, K), lambda t, r: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, K), lambda t, r: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda t, r: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 16, K), lambda t, r: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 16, RB), lambda t, r: (t, 0, r),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((T, 16, R), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((RB, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024),
    )

    # Checksum-fetch timing: the axon tunnel under-waits block_until_ready
    # on unfetched outputs (PERF_NOTES round-2 item 3).
    @jax.jit
    def g(dirs, *a):
        def body(i, acc):
            # coupling via dirs so iterations cannot be CSE'd/elided;
            # vector carry (scalar reduce->rebroadcast costs ~0.5 ms/iter)
            (o,) = f(dirs + acc[None, :, None] * 1e-30, *a)
            return acc + o[0, 0, :]
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((R,)))

    args = (dirs, basis, axes, plane, scale, opac, sh)
    float(jnp.sum(g(*args)))
    t0 = time.perf_counter()
    float(jnp.sum(g(*args)))
    dt = (time.perf_counter() - t0) / ITERS
    pairs = T * R * K
    print(f"{level:10s}: {dt * 1e3:6.2f} ms   "
          f"{pairs / dt / 1e9:6.2f} G pairs/s", flush=True)


if __name__ == "__main__":
    import sys
    levels = sys.argv[1:] or ("intersect", "scan", "full", "nodiv",
                              "noexp", "rowloop")
    for level in levels:
        run(level)
