#!/bin/bash
# Round-10 second pass: re-measure the prefix curve after the early
# sh-release fix, and measure the capped-minhash boilerplate curve the
# x30 octave motivated.
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=10
rm -f target/scale_logs/status10b.txt

run() { # mode factors queries out_name
  sbt -batch "runMain graft.ScaleBench factors=$2 passes=3 mode=$1 queries=$3" \
    > target/scale_logs/$4.log 2>&1
  echo "$4 exit=$?" >> target/scale_logs/status10b.txt
  cp /tmp/graftscale/scale_results_$1.json target/scale_logs/$4.json 2>/dev/null
}

run disjoint 1,3,10,30 "q_dedup_ngram_prefix" r10b_prefix_disjoint
run boilerplate 1,3,10,30 "q_dedup_minhash_capped" r10b_minhashcap_boilerplate

echo ALL_DONE >> target/scale_logs/status10b.txt
