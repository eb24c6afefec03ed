#!/bin/bash
# Three-way full-driver A/B (bench.py, fixed 20-iteration budget):
#   cur      = fused line-search kernel + in-place trajectory aliasing
#   noalias  = fused kernel, no aliasing          (.worktrees/noalias @5816d33)
#   prefuse  = two-phase line search, echo carry  (.worktrees/prefuse @85cb154)
# Interleaved legs (drift control), shared persistent compile cache.
set -u
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache_ab
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=-1
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
OUT=${1:-/tmp/ab_driver3.log}
for leg in 1 2 3; do
  for tree in /root/repo /root/repo/.worktrees/noalias /root/repo/.worktrees/prefuse; do
    name=$(basename "$tree"); [ "$name" = repo ] && name=cur
    echo "=== leg $leg tree $name $(date -u +%H:%M:%S)" >> "$OUT"
    (cd "$tree" && timeout 1500 python bench.py) >> "$OUT" 2>&1
    echo "exit=$?" >> "$OUT"
  done
done
echo "DONE $(date -u +%H:%M:%S)" >> "$OUT"
