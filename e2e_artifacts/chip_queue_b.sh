#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== bf16 microbench (cmp-free body) ==="
timeout 600 python scripts/bf16_microbench.py
echo "=== sharded overhead (task 7) ==="
timeout 1800 python scripts/sharded_overhead.py
echo "=== quality spot-check: flagship + 16x32 plain with int_overlap ==="
timeout 3600 python scripts/quality_check.py 4000 64x2650 0 "8x128 K=256 rebin10,16x32 K=128 rebin10"
echo "=== import roundtrip (task 6) ==="
timeout 7200 python scripts/import_roundtrip.py
echo "QUEUE_B_DONE"
