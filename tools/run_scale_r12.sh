#!/bin/bash
# Round-12 measurement pass, ONE sequential session (never run sbt
# concurrently with a measurement; status lines to target/scale_logs).
# Produces:
#   1. the drift-attribution cells (r11 verdict #1): isolated 5-pass
#      medians at x1 for the ~12 queries whose bench times drifted +17%
#      in-session at r11 — code-unchanged queries vs the winnow family's
#      probe/persist fixed cost;
#   2. a full sf0.1 bench in this session (self-check of the common-set
#      recovery before the driver's own run);
#   3. the vecrand curve (distinct replica vectors): fixed-nbits delta
#      dedup vs the capped and probe-scaled forms — the regime the r11
#      verdict's watch #2 named (uncapped measured only to x10: its
#      candidate join grows with the corpus BY DESIGN there);
#   4. disjoint delta-vs-full re-measure after the fixed-action fold
#      (r11 verdict #4 done-criterion);
#   5. shared + boilerplate refreshes of the r11 curves on r12 code;
#   6. the semantic contrast (gated auto path);
#   7. the qset axis with the chunkSize sweep (500/1000/2000 at 10k).
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=12
rm -f target/scale_logs/status12.txt

run() { # mode factors passes queries out_name
  sbt -batch "runMain graft.ScaleBench factors=$2 passes=$3 mode=$1 queries=$4" \
    > target/scale_logs/$5.log 2>&1
  echo "$5 exit=$?" >> target/scale_logs/status12.txt
  cp /tmp/graftscale/scale_results_$1.json target/scale_logs/$5.json 2>/dev/null
}

# 1. drift attribution: isolated x1 cells, 5-pass medians
run disjoint 1 5 "q_stream_search,q_text_quality,q_dsl_hybrid,q_token_commonness,q_stream_windowed,q_dedup_winnow,q_dedup_winnow_capped,q_dedup_winnow_auto,q_dedup_substring,q_dedup_excise,q_dedup_embedding_lsh,q_stream_dedup_minhash" r12_drift_x1

# 2. full sf0.1 bench in a fresh process (the driver protocol)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=target/scale_logs/r12_bench_sf01.json \
  sbt -batch "runMain graft.Bench" > target/scale_logs/r12_bench.log 2>&1
echo "r12_bench exit=$?" >> target/scale_logs/status12.txt

# 3. vecrand: capped + scaled to x30; uncapped fixed-nbits only to x10
#    (its candidate join is the linear-growth regime under measurement)
run vecrand 1,3,10,30 3 "q_dedup_embedding_delta_capped,q_dedup_embedding_delta_scaled,q_dedup_embedding_lsh_capped" r12_vecrand
run vecrand 1,3,10 3 "q_dedup_embedding_delta" r12b_vecrand_uncapped

# 4. disjoint delta-vs-full after the fixed-action fold
run disjoint 1,3,10,30 3 "q_dedup_minhash_delta,q_dedup_winnow_delta,q_dedup_embedding_delta,q_dedup_embedding_delta_scaled,q_dedup_embedding_lsh" r12_disjoint

# 5. regime refreshes on r12 code
run shared 1,3,10,30 3 "q_dedup_winnow,q_dedup_embedding_lsh" r12_shared
run boilerplate 1,3,10,30 3 "q_dedup_ngram_capped,q_dedup_ngram_auto,q_dedup_ngram_prefix" r12_boilerplate

# 6. semantic contrast (reads the disjoint replica dirs built in 4)
sbt -batch "runMain graft.ProfileSemantic factors=1,3,10,30 passes=3" \
  > target/scale_logs/r12_semantic.log 2>&1
echo "r12_semantic exit=$?" >> target/scale_logs/status12.txt
cp /tmp/graftscale/scale_results_semantic.json target/scale_logs/r12_semantic.json 2>/dev/null

# 7. qset axis + chunkSize sweep
sbt -batch "runMain graft.QsetBench nqs=1000,10000 passes=3 unionCap=100 chunks=500,2000" \
  > target/scale_logs/r12_qset.log 2>&1
echo "r12_qset exit=$?" >> target/scale_logs/status12.txt
cp /tmp/graftscale/scale_results_qset.json target/scale_logs/r12_qset.json 2>/dev/null

echo ALL_DONE >> target/scale_logs/status12.txt
