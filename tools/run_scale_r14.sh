#!/bin/bash
# Round-14 measurement pass, ONE sequential session (never run sbt
# concurrently with a measurement; status lines to target/scale_logs).
# Produces, in priority order:
#   1. a full sf0.1 bench on the r14 code — the self-check AND the
#      task-#2 done-criterion (the 20-query delta/stream family must be
#      back inside the drift band of r12's common-set contribution after
#      the fixed-action-floor buy-back, with the partitioned ClusterFold
#      publish in the loop);
#   2. StreamCurve probe cells (task-#1 done-criterion: per-batch fold
#      wall + read/write bytes FLAT as the seeded corpus grows x1-x30 at
#      fixed batch size, all three legs) + aging curves (task #5:
#      per-batch wall vs epoch over a full x1 stream) + gatevar (task #3:
#      3 same-process runs of q_stream_dedup_clusters_embedding with
#      per-batch durations — bound the 1.6x cross-session spread);
#   3. the compaction contrast cell (task #4: probe wall + file count
#      after 100 appends, with vs without leaf compaction);
#   4. fixedbatch trio refresh on r14 code (the r13 flat-read win must
#      survive the delta-path changes);
#   5. textrand delta refresh (like-for-like vs r13 on the changed
#      delta code).
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=14
rm -f target/scale_logs/status14.txt

run() { # mode factors passes queries out_name
  sbt -batch "runMain graft.ScaleBench factors=$2 passes=$3 mode=$1 queries=$4" \
    > target/scale_logs/$5.log 2>&1
  echo "$5 exit=$?" >> target/scale_logs/status14.txt
  cp /tmp/graftscale/scale_results_$1.json target/scale_logs/$5.json 2>/dev/null
}

# 1. full sf0.1 bench on r14 code (floor buy-back + partitioned fold)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=target/scale_logs/r14_bench_sf01.json \
  sbt -batch "runMain graft.Bench" > target/scale_logs/r14_bench.log 2>&1
echo "r14_bench exit=$?" >> target/scale_logs/status14.txt

# 2. stream curves: probe x1/x10/x30 (all legs) + aging + gatevar
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.StreamCurve cells=probe,aging,gatevar factors=1,10,30 batches=20 gatevar_n=3" \
  > target/scale_logs/r14_streamcurve.log 2>&1
echo "r14_streamcurve exit=$?" >> target/scale_logs/status14.txt
cp /tmp/graftscale/stream_curve.json target/scale_logs/r14_streamcurve.json 2>/dev/null

# 3. compaction contrast (100 appends, with vs without)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.StreamCurve cells=compact appends=100" \
  > target/scale_logs/r14_compact.log 2>&1
echo "r14_compact exit=$?" >> target/scale_logs/status14.txt
cp /tmp/graftscale/stream_curve.json target/scale_logs/r14_compact.json 2>/dev/null

# 4. fixedbatch trio refresh on r14 code
run disjoint 1,10,30 3 "q_dedup_minhash_delta_fixedbatch,q_dedup_winnow_delta_fixedbatch,q_dedup_embedding_delta_fixedbatch" r14_fixedbatch

# 5. textrand delta refresh (changed delta code, like-for-like vs r13)
run textrand 1,10,30 3 "q_dedup_minhash_delta,q_dedup_winnow_delta" r14_textrand

echo ALL_DONE >> target/scale_logs/status14.txt
