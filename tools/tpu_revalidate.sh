#!/bin/sh
# On-chip revalidation after the session's changes (run when tunnel is back).
set -u
cd /root/repo
out=${1:-/tmp/tpu_revalidate.txt}
: > "$out"

step() { echo "=== $1" >> "$out"; shift; timeout 1200 "$@" >> "$out" 2>&1; echo "rc=$?" >> "$out"; }

# 1. memory-stats probe (new device_memory_report surface)
step memreport python -c "
from vit2spn_tpu.utils.profiling import device_memory_report
print(device_memory_report())"

# 2. canonical tiny bench (post kernel/env refactors; expect ~3100-3140)
step bench_tiny python bench.py

# 3. cold hires epoch (bench cold-path change: ceil steps + permutation)
step bench_cold python bench.py --mode hires --cold

echo DONE >> "$out"
