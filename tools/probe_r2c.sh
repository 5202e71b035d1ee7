#!/bin/sh
# Round-2 probe set 3: decouple the MLP-bwd tile from the attn-bwd tile
# (MLP-bwd is pure large GEMMs — no per-image attention unroll), plus a
# bwd-tile-8 retry at a higher VMEM budget under the new fwd16 default.
set -u
cd "$(dirname "$0")/.."
out=/tmp/probe_r2d.txt
: > "$out"

run() {
  name=$1; shift
  echo "=== $name : $*" >> "$out"
  env "$@" timeout 900 python bench.py >> "$out" 2>&1
  echo "rc=$?" >> "$out"
}

run mlp8  VIT2SPN_MLP_BWD_TILE=8 VIT2SPN_MLP_BWD_VMEM_MB=24
run mlp16 VIT2SPN_MLP_BWD_TILE=16 VIT2SPN_MLP_BWD_VMEM_MB=48
true

echo DONE >> "$out"
