#!/bin/sh
# Round-2 probe set 3: decouple the MLP-bwd tile from the attn-bwd tile
# (MLP-bwd is pure large GEMMs — no per-image attention unroll). The
# bwd-tile-8 retry originally planned here was run separately (results in
# CLAUDE.md); only the mlp8/mlp16 points remain.
set -u
cd "$(dirname "$0")/.."
out=/tmp/probe_r2c.txt
: > "$out"

run() {
  name=$1; shift
  echo "=== $name : $*" >> "$out"
  env "$@" timeout 900 python bench.py >> "$out" 2>&1
  echo "rc=$?" >> "$out"
}

run mlp8  VIT2SPN_MLP_BWD_TILE=8 VIT2SPN_MLP_BWD_VMEM_MB=24
run mlp16 VIT2SPN_MLP_BWD_TILE=16 VIT2SPN_MLP_BWD_VMEM_MB=48

echo DONE >> "$out"
