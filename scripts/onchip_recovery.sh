#!/bin/bash
# (committed copy of the post-recovery runbook; see PERF_NOTES.md)
# Post-recovery on-chip sequence. Run detached; logs to /tmp/onchip_*.log
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== 1. tpu_parity ($(date)) ==="
timeout -k 15 900 python scripts/tpu_parity.py > /tmp/onchip_parity.log 2>&1
echo "parity rc=$? tail: $(tail -2 /tmp/onchip_parity.log | head -2)"
echo "=== 2. bench ($(date)) ==="
timeout -k 15 900 python bench.py > /tmp/onchip_bench.log 2>&1
echo "bench rc=$? tail: $(tail -1 /tmp/onchip_bench.log)"
echo "=== 3. stage profile ($(date)) ==="
timeout -k 15 900 python scripts/profile_stages.py > /tmp/onchip_stages.log 2>&1
echo "stages rc=$?"
echo "=== done ($(date)) ==="
