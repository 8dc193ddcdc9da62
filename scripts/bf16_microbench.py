"""Does Mosaic issue PACKED bf16 VPU ops on v5e (2 lanes/slot = 2x)?

The round-4 roofline's first "practical path" item is bf16 packing of
the forward kernel's gate-phase operands.  That only pays if bf16
elementwise arithmetic actually runs ~2x f32 under Mosaic on this chip.
This kernel repeats a gate-phase-shaped elementwise body (fma, mul,
min, compare, select, exp) REPS times over a (ROWS, LANES) block in
either dtype and times the difference; REPS scales the body so launch
overhead washes out.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bf16_microbench.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

ROWS = int(os.environ.get("MB_ROWS", 512))
LANES = int(os.environ.get("MB_LANES", 1024))
REPS = int(os.environ.get("MB_REPS", 64))
CHAIN = int(os.environ.get("MB_CHAIN", 8))


def _kernel(a_ref, b_ref, o_ref, *, dtype, reps, with_exp):
    a = a_ref[...]
    b = b_ref[...]
    half = jnp.asarray(0.5, dtype)
    amax = jnp.asarray(0.99, dtype)
    amin = jnp.asarray(1.0 / 255.0, dtype)
    acc = jnp.zeros_like(a)
    for _ in range(reps):
        # gate-phase-shaped body WITHOUT compares: Mosaic rejects bf16
        # cmpf on v5e ("Target does not support this comparison") even
        # though it packs bf16 arithmetic 2/slot — so a bf16 gate phase
        # could only use arithmetic gating (min/max saturation), which is
        # what this body models: 2 fma, 2 mul, exp?, min, max-clamp.
        u = a * b + half
        v = u * a - half
        g = jnp.exp(-(u * u + v * v)) if with_exp else (u * u + v * v)
        al = jnp.minimum(amax, g * b)
        gate = jnp.maximum(jnp.minimum((al - amin) * amax, amax),
                           jnp.zeros_like(al))
        acc = acc + al * gate
        a = a + jnp.asarray(1e-6, dtype)
    o_ref[...] = acc


def run(dtype, with_exp: bool) -> float:
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0.1, 0.9, (ROWS, LANES)), dtype)
    b = jnp.asarray(rng.uniform(0.1, 0.9, (ROWS, LANES)), dtype)
    kernel = functools.partial(_kernel, dtype=dtype, reps=REPS,
                               with_exp=with_exp)
    from lidar_rt_tpu.ops.pallas_common import use_interpret
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=use_interpret(),
    )

    @jax.jit
    def chained(a, b):
        def body(c, _):
            out = f(a + c, b)
            return out[0, :1] * 0.0, out

        c, outs = jax.lax.scan(body, a[0, :1] * 0.0, None, length=CHAIN)
        return c

    jax.block_until_ready(chained(a, b))
    t0 = time.time()
    np.asarray(chained(a, b))
    return (time.time() - t0) / CHAIN * 1e3


def main() -> None:
    for with_exp in (False, True):
        f32 = run(jnp.float32, with_exp)
        bf16 = run(jnp.bfloat16, with_exp)
        tag = "with exp" if with_exp else "no exp  "
        print(f"{tag}: f32 {f32:7.3f} ms  bf16 {bf16:7.3f} ms  "
              f"ratio f32/bf16 = {f32 / bf16:.2f}x")
    print("(ratio ~2x => Mosaic packs bf16; ~1x => packing buys nothing)")


if __name__ == "__main__":
    main()
