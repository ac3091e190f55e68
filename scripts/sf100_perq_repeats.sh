#!/bin/bash
# Round-11 sf100 repeat protocol, per-query JVM variant: the 5-queries-
# per-JVM reps accumulate each query's shuffle files in one block
# manager (the ContextCleaner frees them lazily), and on this
# container's ~50 GB-free /tmp the 4th/5th query lands on the disk
# ceiling (rep3's q208 died fetching its own shuffle data).  One JVM
# per query bounds the block-manager footprint to a single query and
# makes casualty cascades (q218 conn-refused after a q208 death)
# impossible.  Heap/partitions from the environment, as repeat_scale.sh.
# Usage: sf100_perq_repeats.sh <reps> <outprefix>
set -u
REPS=$1; PREFIX=$2
QUERIES="q140_lpa_communities q189_core_decomposition q201_single_linkage_msf q208_bfs_reach q218_neighborhood_function"
for i in $(seq 1 "$REPS"); do
  for q in $QUERIES; do
    echo "=== rep $i $q start $(date -u +%H:%M:%S) free=$(df --output=avail -BG / | tail -1 | tr -d ' G')G ==="
    SCALE_QUERIES="$q" timeout 3600 python /root/repo/scripts/bench_scale.py \
      /root/repo/scale_data/sf100 "${PREFIX}_rep${i}_${q}.json" 2>&1 \
      | grep -v "^\[Stage" | grep -E "^(q|\{)" || echo "rep $i $q: run died"
  done
done
echo "=== all reps done $(date -u +%H:%M:%S) ==="
