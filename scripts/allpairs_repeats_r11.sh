#!/bin/bash
# Round-10 verdict item 6: extend the repeat protocol to the all-pairs
# family (q162/q173/q176/q223 ran single-shot in earlier rehearsals).
# One JVM per query per rep (same rationale as sf100_perq_repeats.sh).
# q173 (grid+GEMM exact cosine all-pairs) is genuinely quadratic in the
# corpus (332 s at sf3 single-shot) — it repeats at sf3 only; the
# sub-quadratic members repeat at sf3 AND sf10.
# Usage: allpairs_repeats_r11.sh <reps> <outprefix>
set -u
REPS=$1; PREFIX=$2
for i in $(seq 1 "$REPS"); do
  for q in q162_allpairs_similarity q176_tfidf_cosine_allpairs q223_containment_join q173_cosine_allpairs; do
    echo "=== rep $i sf3 $q start $(date -u +%H:%M:%S) ==="
    SCALE_QUERIES="$q" timeout 3600 python /root/repo/scripts/bench_scale.py \
      /root/repo/scale_data/sf3 "${PREFIX}_sf3_rep${i}_${q}.json" 2>&1 \
      | grep -v "^\[Stage" | grep -E "^(q|\{)" || echo "rep $i sf3 $q: run died"
  done
  for q in q162_allpairs_similarity q176_tfidf_cosine_allpairs q223_containment_join; do
    echo "=== rep $i sf10 $q start $(date -u +%H:%M:%S) ==="
    SCALE_QUERIES="$q" timeout 3600 python /root/repo/scripts/bench_scale.py \
      /root/repo/scale_data/sf10 "${PREFIX}_sf10_rep${i}_${q}.json" 2>&1 \
      | grep -v "^\[Stage" | grep -E "^(q|\{)" || echo "rep $i sf10 $q: run died"
  done
done
echo "=== all reps done $(date -u +%H:%M:%S) ==="
