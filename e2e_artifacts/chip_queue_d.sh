#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== ladder seed 1: flagship + 16x32 contenders ==="
timeout 3600 python scripts/quality_check.py 4000 64x2650 1 "8x128 K=256 rebin10,16x32 K=128 rebin10"
echo "=== stage profile (post round-5 changes) ==="
timeout 900 python scripts/profile_stages.py 2>/dev/null || true
echo "QUEUE_D_DONE"
