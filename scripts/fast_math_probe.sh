#!/bin/bash
# (committed copy; run ONLY after scripts/onchip_recovery.sh passes)
# fast_math hang re-test under the hoisted-MXU kernel structure.
# Escalating sizes, each in its own process with a hard kill so a hang
# cannot wedge more than one grant. Run ONLY after /tmp/onchip_seq.sh.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
for SIZE in "16 256 4096" "32 512 16384" "64 2650 131072"; do
  set -- $SIZE
  echo "=== fwd+bwd fast_math H=$1 W=$2 N=$3 ($(date)) ==="
  timeout -k 10 300 python - "$1" "$2" "$3" <<'PY'
import sys, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import bench
from lidar_rt_tpu.core import rays as rays_lib
from lidar_rt_tpu.ops import tracer as tracer_lib
from lidar_rt_tpu.ops.binning import TileConfig

H, W, N = (int(a) for a in sys.argv[1:4])
grid = rays_lib.SensorGrid.from_bounds(H, (-0.31, 0.04), pixel_offset=0.5)
s2w = jnp.eye(4).at[2, 3].set(2.0)
bg = jnp.array([0.0, 0.0, 1.0])
b = bench.street_scene_bundle(N)
cfg = tracer_lib.TraceConfig(
    tile=TileConfig(tile_h=8, tile_w=128, max_per_tile=256, binner="hier",
                    approx_topk=True),
    exact_order=False, ray_block=512, fast_math=True)

def loss(bb):
    out = tracer_lib.trace(bb, grid, W, s2w, bg, 3, cfg)
    return jnp.sum(out.channels[..., 0:4] ** 2)

t0 = time.time()
l, g = jax.value_and_grad(loss)(b)
jax.block_until_ready(g)
print("OK fwd+bwd", float(l), "in", round(time.time() - t0, 1), "s")
PY
  rc=$?
  echo "rc=$rc"
  if [ $rc -ne 0 ]; then echo "STOP: fast_math still hangs/fails at $SIZE"; exit 1; fi
done
echo "fast_math probe PASSED all sizes"
