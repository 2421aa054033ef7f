#!/bin/bash
# Fresh-JVM alternating A/B of the four BENCH_r09 regression rows
# (VERDICT r9 #1): HEAD vs the round-8 commit (worktree .ab_r8).
# Alternation cancels host drift at the process level; job counts are
# host-immune plan fingerprints.
set -u
cd "$(dirname "$0")/.."
HEAD_ROOT=$PWD
R8_ROOT=$PWD/.ab_r8
for cycle in 1 2; do
  for q in density_clusters_lsh simhash64_near_pairs louvain_user_communities bench_louvain_planted_5m; do
    for root in "$HEAD_ROOT" "$R8_ROOT"; do
      echo "=== cycle$cycle $q $(basename "$root")"
      timeout 900 python scripts/ab_query_solo.py "$root" "$q" 2 2>/dev/null | grep -E "rep|SOLO"
    done
  done
done
