#!/bin/bash
# Round-13 measurement pass, ONE sequential session (never run sbt
# concurrently with a measurement; status lines to target/scale_logs).
# Produces, in priority order:
#   1. a full sf0.1 bench on the partitioned-index code (self-check: the
#      layout change must not regress the driver bench — partitionBy
#      write overhead vs pruned-read wins);
#   2. the disjoint delta set x1-x30 (task-#2 done-criterion: the
#      embedding disjoint delta vs the 10.3 s full re-dedup; plus
#      like-for-like vs the r12c narrowed baselines);
#   3. the _fixedbatch trio (task-#1 done-criterion: micro-batch deltas
#      against factor-scaled-partition indexes — input_read_mb flat-ish
#      x1 -> x30);
#   4. vecrand x1-x30 for the capped + scaled embedding delta (task-#5
#      AQE-flip counter pin at the x10 -> x30 crossover);
#   5. textrand x1-x30 minhash/winnow deltas (task #7 — distinct random
#      content, the vecrand regime on the text legs);
#   6. the semantic contrast incl. the argmax-shape cells (task-#4
#      counter pin: window vs aggregation shuffle bytes) — reads the
#      disjoint replica dirs built in 2;
#   7. qset axis with the chunk sweep incl. the auto default (task-#3
#      done-criterion: auto >= best constant at 1k AND 10k);
#   8. shared + boilerplate refreshes on r13 code (keeps those modes in
#      the Bench artifact regex).
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=13
rm -f target/scale_logs/status13.txt

run() { # mode factors passes queries out_name
  sbt -batch "runMain graft.ScaleBench factors=$2 passes=$3 mode=$1 queries=$4" \
    > target/scale_logs/$5.log 2>&1
  echo "$5 exit=$?" >> target/scale_logs/status13.txt
  cp /tmp/graftscale/scale_results_$1.json target/scale_logs/$5.json 2>/dev/null
}

# 1. full sf0.1 bench on partitioned-index code
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=target/scale_logs/r13_bench_sf01.json \
  sbt -batch "runMain graft.Bench" > target/scale_logs/r13_bench.log 2>&1
echo "r13_bench exit=$?" >> target/scale_logs/status13.txt

# 2. disjoint delta set (r12c comparison set + the scaled/lsh contrast)
run disjoint 1,3,10,30 3 "q_dedup_minhash_delta,q_dedup_winnow_delta,q_dedup_embedding_delta,q_dedup_embedding_delta_scaled,q_dedup_embedding_lsh" r13_disjoint

# 3. fixed-micro-batch deltas vs factor-scaled-partition indexes
run disjoint 1,3,10,30 3 "q_dedup_minhash_delta_fixedbatch,q_dedup_winnow_delta_fixedbatch,q_dedup_embedding_delta_fixedbatch" r13_fixedbatch

# 4. vecrand: the AQE-flip counter pin (scaled to x30) + capped contrast
run vecrand 1,3,10,30 3 "q_dedup_embedding_delta_capped,q_dedup_embedding_delta_scaled,q_dedup_embedding_lsh_capped" r13_vecrand

# 5. textrand: distinct random content on the text delta legs
run textrand 1,3,10,30 3 "q_dedup_minhash_delta,q_dedup_winnow_delta" r13_textrand

# 6. semantic contrast + argmax-shape counter cells
sbt -batch "runMain graft.ProfileSemantic factors=1,3,10,30 passes=3" \
  > target/scale_logs/r13_semantic.log 2>&1
echo "r13_semantic exit=$?" >> target/scale_logs/status13.txt
cp /tmp/graftscale/scale_results_semantic.json target/scale_logs/r13_semantic.json 2>/dev/null

# 7. qset axis + chunk sweep (hybrid_rel = the auto default)
sbt -batch "runMain graft.QsetBench nqs=1000,10000 passes=3 unionCap=100 chunks=500,1000,2000" \
  > target/scale_logs/r13_qset.log 2>&1
echo "r13_qset exit=$?" >> target/scale_logs/status13.txt
cp /tmp/graftscale/scale_results_qset.json target/scale_logs/r13_qset.json 2>/dev/null

# 8. regime refreshes on r13 code
run shared 1,3,10,30 3 "q_dedup_winnow,q_dedup_embedding_lsh" r13_shared
run boilerplate 1,3,10,30 3 "q_dedup_ngram_capped,q_dedup_ngram_auto,q_dedup_ngram_prefix" r13_boilerplate

# final-code full bench (the round-close self-check)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=target/scale_logs/r13b_bench_sf01.json \
  sbt -batch "runMain graft.Bench" > target/scale_logs/r13b_bench.log 2>&1
echo "r13b_bench exit=$?" >> target/scale_logs/status13.txt

echo ALL_DONE >> target/scale_logs/status13.txt
