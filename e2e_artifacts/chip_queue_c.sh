#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== sharded overhead rerun (check_vma fixed) ==="
timeout 2400 python scripts/sharded_overhead.py
echo "=== verify drive ==="
cd /tmp && timeout 2400 python /root/repo/.claude/skills/verify/drive.py
cd /root/repo
echo "=== bench confirm ==="
timeout 900 python bench.py
echo "QUEUE_C_DONE"
