#!/bin/bash
# Round-17 follow-up session (sequential; status to target/scale_logs):
#   0. clampread + aging re-run with the FIXED read counter (proc_read_kb
#      — the r17 instrument finding: every earlier read-KB number was
#      footer-only);
#   1. INTERLEAVED cross-commit full-bench A/B (ff99913 = r16 final HEAD
#      vs r17 HEAD), A,B,A,B order so window drift contaminates both
#      sides equally — the r17 isolated profile wins were measured across
#      a recovering host window, so the code-attributable bench delta
#      needs matched windows;
#   2. attribution profile A/B for the r15->r16 clustered-stream
#      regression (b0acf39 vs f4690e7 vs HEAD), anchor-sandwiched.
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g
rm -f target/scale_logs/status17ab.txt
HEAD_SHA=$(git rev-parse HEAD)
cp tools/Anchor.java target/scale_logs/Anchor.java  # survives checkouts

# 0. fixed-counter clampread + aging
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.StreamCurve cells=clampread,aging batches=20" \
  > target/scale_logs/r17_clampread2.log 2>&1
echo "r17_clampread2 exit=$?" >> target/scale_logs/status17ab.txt
cp /tmp/graftscale/stream_curve.json target/scale_logs/r17_clampread2.json 2>/dev/null

run_bench () { # $1 = commit, $2 = tag
  git checkout -q "$1" || { echo "checkout $1 FAILED" >> target/scale_logs/status17ab.txt; return 1; }
  echo "== $2 ($1) anchors:" >> target/scale_logs/status17ab.txt
  java target/scale_logs/Anchor.java 2 >> target/scale_logs/status17ab.txt 2>/dev/null
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_OUT=target/scale_logs/ab_${2}_bench.json \
    sbt -batch "runMain graft.Bench" > target/scale_logs/ab_${2}.log 2>&1
  echo "$2 exit=$?" >> target/scale_logs/status17ab.txt
}

# 1. interleaved bench A/B
run_bench ff99913 r16_a
run_bench "$HEAD_SHA" r17_a
run_bench ff99913 r16_b
run_bench "$HEAD_SHA" r17_b

# 2. attribution profile A/B (winnow cluster leg: per-batch path is
# byte-identical r16->r17, so r15-vs-r16 isolates the fold prologue+lock)
for C in b0acf39 f4690e7 $HEAD_SHA; do
  git checkout -q $C || break
  echo "== commit $C" >> target/scale_logs/r17_ab_profile.log
  java target/scale_logs/Anchor.java 2 >> target/scale_logs/r17_ab_profile.log 2>/dev/null
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    sbt -batch "runMain graft.Profile passes=7 q_stream_dedup_clusters_winnow q_stream_dedup_embedding" 2>/dev/null \
    | grep profile >> target/scale_logs/r17_ab_profile.log
done
git checkout -q "$HEAD_SHA"
echo "AB DONE $(date)" >> target/scale_logs/status17ab.txt
