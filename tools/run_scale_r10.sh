#!/bin/bash
# Round-10 scaling capture (run inside tmux; logs under target/scale_logs/):
#   1. whole-curve ISOLATED x1,3,10,30 disjoint for the prefix/capped dedup
#      paths with the new shuffle/spill instrumentation and AQE
#      partition-count headroom — the r9 verdict's octave question, measured
#      clean (the r9 cells were composed from narrowed re-runs; these are
#      one-process whole curves);
#   2. x30 octaves for the remaining scale flagships (minhash, embedding
#      LSH, decontaminate LSH, winnow) in their regimes — previously
#      x10-only;
#   3. the query-count sweep (QsetBench nqs=10,100,1000) over the batch
#      serving shapes — the axis the per-corpus curves never measured;
#   4. the auto-dispatch ngram form on the disjoint curve (probe cost +
#      the uncapped dispatch it makes there).
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=10
rm -f target/scale_logs/status10.txt

run() { # mode factors queries out_name
  sbt -batch "runMain graft.ScaleBench factors=$2 passes=3 mode=$1 queries=$3" \
    > target/scale_logs/$4.log 2>&1
  echo "$4 exit=$?" >> target/scale_logs/status10.txt
  cp /tmp/graftscale/scale_results_$1.json target/scale_logs/$4.json 2>/dev/null
}

# 1. prefix/capped whole curve, isolated, instrumented (+ auto rides along)
run disjoint 1,3,10,30 "q_dedup_ngram_prefix,q_dedup_ngram_capped,q_dedup_ngram_auto" r10_prefixcurve_disjoint

# 2. x30 octaves for the rest of the dedup scale paths
run disjoint 1,3,10,30 "q_dedup_minhash,q_dedup_winnow,q_decontaminate,q_decontaminate_embedding_lsh" r10_x30_disjoint
run shared 1,3,10,30 "q_dedup_minhash,q_dedup_embedding_lsh,q_dedup_winnow,q_dedup_winnow_capped" r10_x30_shared
run boilerplate 1,3,10,30 "q_dedup_minhash,q_dedup_embedding_lsh,q_dedup_winnow_capped" r10_x30_boilerplate

# 3. query-count sweep at fixed corpus (sf0.1)
sbt -batch "runMain graft.QsetBench nqs=10,100,1000 passes=3 unionCap=100" \
  > target/scale_logs/r10_qset.log 2>&1
echo "r10_qset exit=$?" >> target/scale_logs/status10.txt
cp /tmp/graftscale/scale_results_qset.json target/scale_logs/r10_qset.json 2>/dev/null

echo ALL_DONE >> target/scale_logs/status10.txt
