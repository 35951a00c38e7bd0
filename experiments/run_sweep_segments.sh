#!/bin/bash
# Consistency sweep in process-recycled segments: XLA:CPU's in-process
# executable cache grows without bound across fresh instance shapes and
# OOMs LLVM after ~20 min on this host (docs/PERFORMANCE.md) — so run
# N short segments, each a fresh python process with an advancing base
# seed (fresh cases every segment).
#
# Usage: run_sweep_segments.sh [segments=4] [minutes=8] [base0=200000]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
segments=${1:-4}
minutes=${2:-8}
base=${3:-200000}
for ((i = 0; i < segments; i++)); do
  b=$((base + i * 10000))
  echo "=== segment $((i + 1))/$segments base=$b ==="
  timeout $(( (minutes + 4) * 60 )) \
    python experiments/exp_consistency_sweep.py "$minutes" "$b" --sharded \
    || echo "SEGMENT base=$b FAILED (rc=$?)"
done
