#!/bin/bash
# Post-counts-fold re-sweep of the merge-kernel tile width (CSSM_KBLOCK) and
# duplication window (CSSM_DUP_WINDOW) at the headline shape (N=2^20, T=1000).
# One bench subprocess per config: the knobs are read at trace time and the
# jit cache is keyed on shapes only (inference/filter.py::_kernel_block).
# Usage: bash scripts/sweep_kblock.sh 2>&1 | tee /tmp/sweep.log
set -u
cd "$(dirname "$0")/.."
for cfg in "4096 3" "8192 3" "4096 4"; do
  set -- $cfg
  echo "=== KBLOCK=$1 W=$2 ==="
  CSSM_KBLOCK=$1 CSSM_DUP_WINDOW=$2 \
    python bench.py --no-secondary 2>&1 | grep -E "run |compile|metric"
done
