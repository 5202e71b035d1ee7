#!/bin/sh
# Round-2 perf probes: the three tile/VMEM configs NOT covered by the
# post-gray-fold sweep (tools/bwd_sweep.py history in CLAUDE.md). Runs the
# canonical bench.py harness once per config — serialized, 1-vCPU host.
set -u
cd "$(dirname "$0")/.."
out=/tmp/probe_r2.txt
: > "$out"

run() {
  name=$1; shift
  echo "=== $name : $*" >> "$out"
  env "$@" timeout 900 python bench.py >> "$out" 2>&1
  echo "rc=$?" >> "$out"
}

# 1. fwd tile 16 (round-1 "fwd >8 slower" predates explicit vmem_limit)
run fwd16 VIT2SPN_FWD_TILE=16 VIT2SPN_FWD_VMEM_MB=40
# 2. fwd tile 4 (more grid steps -> more pipeline overlap?)
run fwd4 VIT2SPN_FWD_TILE=4
# 3. merged bwd at tile 8 (sweep only measured merged at tile 4)
run merged8 VIT2SPN_MERGED_BWD=1 VIT2SPN_BWD_TILE=8 VIT2SPN_BWD_VMEM_MB=36

echo DONE >> "$out"
