#!/bin/bash
# Round-12 third (final) measurement pass, after restoring the
# load-bearing candidate materializations: narrowed disjoint delta cells
# (the r11d-h comparison set) + the final-code full sf0.1 bench.
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=12
rm -f target/scale_logs/status12c.txt

run() { # mode factors passes queries out_name
  sbt -batch "runMain graft.ScaleBench factors=$2 passes=$3 mode=$1 queries=$4" \
    > target/scale_logs/$5.log 2>&1
  echo "$5 exit=$?" >> target/scale_logs/status12c.txt
  cp /tmp/graftscale/scale_results_$1.json target/scale_logs/$5.json 2>/dev/null
}

run disjoint 1,3,10,30 3 "q_dedup_minhash_delta,q_dedup_winnow_delta" r12c_disjoint_mw
run disjoint 1,3,10,30 3 "q_dedup_embedding_delta,q_dedup_embedding_delta_scaled,q_dedup_embedding_lsh" r12c_disjoint_emb

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=target/scale_logs/r12c_bench_sf01.json \
  sbt -batch "runMain graft.Bench" > target/scale_logs/r12c_bench.log 2>&1
echo "r12c_bench exit=$?" >> target/scale_logs/status12c.txt

echo ALL_DONE >> target/scale_logs/status12c.txt
