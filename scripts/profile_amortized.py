"""Stage timing of the AMORTIZED step (fixed tile assignment): prefixes
prep -> +kernel fwd -> +untile/accum -> fwd+bwd, bench methodology."""
import time
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from lidar_rt_tpu.core import rays as rays_lib
from lidar_rt_tpu.core import transforms
from lidar_rt_tpu.ops import pallas_tracer
from lidar_rt_tpu.ops import tracer as tracer_lib
from lidar_rt_tpu.ops.binning import TileConfig, bin_surfels

H, W = bench.H, bench.W
ITERS = 20
TILE = TileConfig(tile_h=8, tile_w=128, max_per_tile=256, binner="hier",
                  approx_topk=True, pad_px=2.0)
PCFG = pallas_tracer.PallasTraceConfig(tile=TILE, ray_block=512,
                                       exact_order=False)

grid = rays_lib.SensorGrid.from_bounds(H, (-0.31, 0.04), pixel_offset=0.5)
s2w = jnp.eye(4).at[2, 3].set(2.0)
bg = jnp.array([0.0, 0.0, 1.0])
bundle = bench.street_scene_bundle(bench.N_SURFELS)
w2s = transforms.invert_se3(s2w)

assignment = jax.jit(lambda b: bin_surfels(
    grid, W, w2s, b.means, b.scales, b.opacities, TILE,
    rotations=b.rotations))(bundle)
assignment = jax.block_until_ready(assignment)
print("mean cand:", float(jnp.mean(jnp.sum(assignment.valid, 1))))

def timed(stage_fn, label):
    def step(carry, _):
        b = bundle._replace(opacities=bundle.opacities + carry * 1e-30)
        return stage_fn(b) * 1e-30 + carry * 0.0, None

    @jax.jit
    def run(bundle):
        out, _ = jax.lax.scan(step, jnp.zeros(()), None, length=ITERS)
        return out

    r = jax.block_until_ready(run(bundle))
    t0 = time.perf_counter()
    r = jax.block_until_ready(run(bundle))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label:34s} {dt:7.2f} ms", flush=True)
    return dt

def s_prep(b):
    origin, _ = rays_lib.range_rays(grid, W, s2w)
    parts = pallas_tracer._prepare_tile_inputs(b, origin, assignment.index,
                                               assignment.valid)
    return sum(jnp.sum(p) for p in parts[:3])

def s_fwd(b):
    out = pallas_tracer.trace(b, grid, W, s2w, bg, 3, PCFG,
                              assignment=assignment)
    return jnp.sum(out.channels[..., 0])

def s_fwdbwd(b):
    def loss(bb):
        out = pallas_tracer.trace(bb, grid, W, s2w, bg, 3, PCFG,
                                  assignment=assignment)
        return (jnp.sum(jnp.abs(out.channels[..., 3])) * 1e-3
                + jnp.sum(out.channels[..., 0] ** 2))
    l, g = jax.value_and_grad(loss)(b)
    return l + jnp.sum(g.means)

t_p = timed(s_prep, "prep (fixed assignment)")
t_f = timed(s_fwd, "fwd (prep+kernel+untile)")
t_fb = timed(s_fwdbwd, "fwd+bwd")
print(f"\nprep {t_p:.2f}  fwd-after-prep {t_f - t_p:.2f}  "
      f"bwd {t_fb - t_f:.2f}  total {t_fb:.2f} "
      f"-> {H * W / (t_fb / 1e3) / 1e6:.1f} Mray/s")
