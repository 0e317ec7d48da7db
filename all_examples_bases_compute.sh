#!/usr/bin/env bash
# Sweep: compute bases for every mesh x subspace combination
# (reference all_examples_bases_compute.sh equivalent).
# Each config is an independent process; on a multi-chip host, export
# JAX_VISIBLE_DEVICES per process (or use scripts/sweep.py for the
# device-mesh-parallel version).
set -euo pipefail

MESHES=(sphere armadillo elephant_normalized octopus)
SUBSPACES=(posSubspace tetstrainSubspace tristrainSubspace vertstarbendingSubspace)

for mesh in "${MESHES[@]}"; do
  for subspace in "${SUBSPACES[@]}"; do
    cfg="configs/examples/${mesh}_${subspace}.json"
    if [[ -f "$cfg" ]]; then
      echo "=== $mesh / $subspace ==="
      python main.py --mesh "$mesh" --config_file "$cfg"
    else
      echo "skip: $cfg (no config)"
    fi
  done
done
