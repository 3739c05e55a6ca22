#!/bin/bash
# Round-13 measurement pass C — final code (auto-nPart + touched-dir
# listing). Priority-ordered; each step's artifact lands in
# target/scale_logs as it completes.
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=13
rm -f target/scale_logs/status13c.txt

run() { # mode factors passes queries out_name
  sbt -batch "runMain graft.ScaleBench factors=$2 passes=$3 mode=$1 queries=$4" \
    > target/scale_logs/$5.log 2>&1
  echo "$5 exit=$?" >> target/scale_logs/status13c.txt
  cp /tmp/graftscale/scale_results_$1.json target/scale_logs/$5.json 2>/dev/null
}

run disjoint 1,10,30 3 "q_dedup_minhash_delta_fixedbatch,q_dedup_winnow_delta_fixedbatch,q_dedup_embedding_delta_fixedbatch" r13c_fixedbatch
run disjoint 1,3,10,30 3 "q_dedup_minhash_delta,q_dedup_winnow_delta,q_dedup_embedding_delta,q_dedup_embedding_delta_scaled,q_dedup_embedding_lsh" r13c_disjoint
run vecrand 1,10,30 3 "q_dedup_embedding_delta_capped,q_dedup_embedding_delta_scaled,q_dedup_embedding_lsh_capped" r13c_vecrand
run textrand 1,10,30 3 "q_dedup_minhash_delta,q_dedup_winnow_delta" r13c_textrand

sbt -batch "runMain graft.ProfileSemantic factors=1,10,30 passes=3" \
  > target/scale_logs/r13_semantic.log 2>&1
echo "r13_semantic exit=$?" >> target/scale_logs/status13c.txt
cp /tmp/graftscale/scale_results_semantic.json target/scale_logs/r13_semantic.json 2>/dev/null

sbt -batch "runMain graft.QsetBench nqs=1000,10000 passes=3 unionCap=100 chunks=500,1000,2000" \
  > target/scale_logs/r13_qset.log 2>&1
echo "r13_qset exit=$?" >> target/scale_logs/status13c.txt
cp /tmp/graftscale/scale_results_qset.json target/scale_logs/r13_qset.json 2>/dev/null

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=target/scale_logs/r13c_bench_sf01.json \
  sbt -batch "runMain graft.Bench" > target/scale_logs/r13c_bench.log 2>&1
echo "r13c_bench exit=$?" >> target/scale_logs/status13c.txt

run shared 1,3,10,30 3 "q_dedup_winnow,q_dedup_embedding_lsh" r13_shared
run boilerplate 1,3,10,30 3 "q_dedup_ngram_capped,q_dedup_ngram_auto,q_dedup_ngram_prefix" r13_boilerplate
echo ALL_DONE >> target/scale_logs/status13c.txt
