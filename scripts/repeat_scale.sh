#!/bin/bash
# Round-11 repeat protocol: N same-day repeats, ONE JVM per repeat (a
# fresh process per run so an OOM in rep k cannot poison rep k+1).
# Heap and session shuffle partitions come from the environment
# (SPARK_GRAFT_DRIVER_MEM / SPARK_GRAFT_SHUFFLE_PARTITIONS) so arms can
# pin their conditions explicitly.
# Usage: repeat_scale.sh <sf_dir> <queries> <reps> <outprefix>
set -u
SF_DIR=$1; QUERIES=$2; REPS=$3; PREFIX=$4
for i in $(seq 1 "$REPS"); do
  echo "=== rep $i ($QUERIES @ $SF_DIR heap=${SPARK_GRAFT_DRIVER_MEM:-8g} parts=${SPARK_GRAFT_SHUFFLE_PARTITIONS:-128}) ==="
  SCALE_QUERIES="$QUERIES" timeout 5400 python /root/repo/scripts/bench_scale.py \
    "$SF_DIR" "${PREFIX}_rep${i}.json" 2>&1 | grep -v "^\[Stage" | tail -8
done
