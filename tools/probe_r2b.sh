#!/bin/sh
# Round-2 follow-up probes after fwd16@40MB won (+1.05%): push the fwd tile
# further and re-check the bwd tile optimum under the new fwd config.
set -u
cd "$(dirname "$0")/.."
out=/tmp/probe_r2b.txt
: > "$out"

run() {
  name=$1; shift
  echo "=== $name : $*" >> "$out"
  env "$@" timeout 900 python bench.py >> "$out" 2>&1
  echo "rc=$?" >> "$out"
}

run fwd32 VIT2SPN_FWD_TILE=32 VIT2SPN_FWD_VMEM_MB=80
run fwd16_bwd8 VIT2SPN_FWD_TILE=16 VIT2SPN_FWD_VMEM_MB=40 \
    VIT2SPN_BWD_TILE=8 VIT2SPN_BWD_VMEM_MB=28

echo DONE >> "$out"
