#!/bin/bash
# Chip queue A: microbench + parity gate + bench sweeps (sequential, one chip user)
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== bf16 microbench ==="
timeout 600 python scripts/bf16_microbench.py
echo "=== tpu_parity --fast (gate for live-gate residual change) ==="
timeout 900 python scripts/tpu_parity.py --fast
echo "=== bench flagship ==="
timeout 900 python bench.py
echo "=== bench rb=1024 ==="
BENCH_RAY_BLOCK=1024 timeout 900 python bench.py
echo "=== bench 16x32 K=128 (post int_overlap) ==="
BENCH_TILE_H=16 BENCH_TILE_W=32 BENCH_K=128 timeout 900 python bench.py
echo "=== bench 16x32 K=128 tail1 ==="
BENCH_TILE_H=16 BENCH_TILE_W=32 BENCH_K=128 BENCH_TAIL=1 timeout 900 python bench.py
echo "QUEUE_A_DONE"
