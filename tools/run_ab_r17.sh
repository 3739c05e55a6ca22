#!/bin/bash
# Round-17 follow-up: INTERLEAVED cross-commit full-bench A/B
# (ff99913 = r16 final HEAD vs r17 HEAD), A,B,A,B order so a window
# drift contaminates both sides equally; every run stamps its own
# anchors (r16's bench lacks the all-cores anchor — the standalone
# tools/Anchor.java sandwiches stand in). The r17 isolated profile wins
# were measured across a recovering host window (anchor 490 -> 538), so
# the code-attributable bench delta needs matched windows to claim.
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g
rm -f target/scale_logs/status17ab.txt
HEAD_SHA=$(git rev-parse HEAD)
cp tools/Anchor.java target/scale_logs/Anchor.java

run_bench () { # $1 = commit, $2 = tag
  git checkout -q "$1" || return 1
  echo "== $2 ($1) anchors:" >> target/scale_logs/status17ab.txt
  java target/scale_logs/Anchor.java 2 >> target/scale_logs/status17ab.txt 2>/dev/null
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_OUT=target/scale_logs/ab_${2}_bench.json \
    sbt -batch "runMain graft.Bench" > target/scale_logs/ab_${2}.log 2>&1
  echo "$2 exit=$?" >> target/scale_logs/status17ab.txt
}

run_bench ff99913 r16_a
run_bench "$HEAD_SHA" r17_a
run_bench ff99913 r16_b
run_bench "$HEAD_SHA" r17_b
git checkout -q "$HEAD_SHA"
echo "AB DONE $(date)" >> target/scale_logs/status17ab.txt
