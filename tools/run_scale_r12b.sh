#!/bin/bash
# Round-12 second measurement pass: (a) the three suite steps that broke
# when a mid-session edit raced the first pass's sbt (boilerplate,
# semantic contrast, qset chunk sweep), (b) narrowed disjoint re-runs of
# the delta queries on the POST-FIX code (compact minhash cache, winnow
# countDistinct replay form) against the r11d-h narrowed baselines, and
# (c) a fresh full sf0.1 bench on final code.
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=12
rm -f target/scale_logs/status12b.txt

run() { # mode factors passes queries out_name
  sbt -batch "runMain graft.ScaleBench factors=$2 passes=$3 mode=$1 queries=$4" \
    > target/scale_logs/$5.log 2>&1
  echo "$5 exit=$?" >> target/scale_logs/status12b.txt
  cp /tmp/graftscale/scale_results_$1.json target/scale_logs/$5.json 2>/dev/null
}

# (b) narrowed delta re-runs, r11-style pairing (one light session each)
run disjoint 1,3,10,30 3 "q_dedup_minhash_delta,q_dedup_winnow_delta" r12b_disjoint_mw
run disjoint 1,3,10,30 3 "q_dedup_embedding_delta,q_dedup_embedding_delta_scaled,q_dedup_embedding_lsh" r12b_disjoint_emb

# (a) the broken steps
run boilerplate 1,3,10,30 3 "q_dedup_ngram_capped,q_dedup_ngram_auto,q_dedup_ngram_prefix" r12_boilerplate

sbt -batch "runMain graft.ProfileSemantic factors=1,3,10,30 passes=3" \
  > target/scale_logs/r12_semantic.log 2>&1
echo "r12_semantic exit=$?" >> target/scale_logs/status12b.txt
cp /tmp/graftscale/scale_results_semantic.json target/scale_logs/r12_semantic.json 2>/dev/null

sbt -batch "runMain graft.QsetBench nqs=1000,10000 passes=3 unionCap=100 chunks=500,2000" \
  > target/scale_logs/r12_qset.log 2>&1
echo "r12_qset exit=$?" >> target/scale_logs/status12b.txt
cp /tmp/graftscale/scale_results_qset.json target/scale_logs/r12_qset.json 2>/dev/null

# (c) final-code full bench
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=target/scale_logs/r12b_bench_sf01.json \
  sbt -batch "runMain graft.Bench" > target/scale_logs/r12b_bench.log 2>&1
echo "r12b_bench exit=$?" >> target/scale_logs/status12b.txt

echo ALL_DONE >> target/scale_logs/status12b.txt
