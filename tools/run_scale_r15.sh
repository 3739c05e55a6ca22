#!/bin/bash
# Round-15 measurement pass, ONE sequential session (never run sbt
# concurrently with a measurement; status lines to target/scale_logs).
# Produces, in priority order:
#   1. a full sf0.1 bench on the r15 code — self-check after the
#      ClusterFold GC/clamp changes, AND the first read on watch #3
#      (q_dedup_embedding_delta's driver-session drift);
#   2. StreamCurve probesplit x1/x10/x30 (VERDICT r14 watch #4 /
#      task #4 done-criterion: embedding probe read bytes split into
#      pruned index-scan floor vs candidate-driven remainder, on the
#      production autoParts grid curve);
#   3. StreamCurve probe refresh x1/x10/x30 all legs — the r14 headline
#      re-stamped with the ADVICE fixes in (seed-epoch sentinel: all 4
#      probe batches now actually fold; size-derived id stride) and the
#      incremental GC in the loop;
#   4. StreamCurve aging (20 batches, all legs) with the new
#      snapshot-debris counters (task #6: files/epoch-dirs/manifest
#      entries at end of stream — the compact-the-snapshot decision
#      input);
#   5. gatevar on q_dedup_embedding_delta (task #5: 3 same-process runs
#      + phys counters for the drift watch).
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=15
rm -f target/scale_logs/status15.txt

# 1. full sf0.1 bench on r15 code
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=target/scale_logs/r15_bench_sf01.json \
  sbt -batch "runMain graft.Bench" > target/scale_logs/r15_bench.log 2>&1
echo "r15_bench exit=$?" >> target/scale_logs/status15.txt

# 2. probesplit (watch #4)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.StreamCurve cells=probesplit factors=1,10,30" \
  > target/scale_logs/r15_probesplit.log 2>&1
echo "r15_probesplit exit=$?" >> target/scale_logs/status15.txt
cp /tmp/graftscale/stream_curve.json target/scale_logs/r15_probesplit.json 2>/dev/null

# 3. probe refresh (headline, all legs, ADVICE fixes + incremental GC in loop)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.StreamCurve cells=probe factors=1,10,30" \
  > target/scale_logs/r15_probe.log 2>&1
echo "r15_probe exit=$?" >> target/scale_logs/status15.txt
cp /tmp/graftscale/stream_curve.json target/scale_logs/r15_probe.json 2>/dev/null

# 4. aging with debris counters (task #6)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.StreamCurve cells=aging batches=20" \
  > target/scale_logs/r15_aging.log 2>&1
echo "r15_aging exit=$?" >> target/scale_logs/status15.txt
cp /tmp/graftscale/stream_curve.json target/scale_logs/r15_aging.json 2>/dev/null

# 5. gatevar on the watch-#3 gate
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.StreamCurve cells=gatevar gatevar_q=q_dedup_embedding_delta gatevar_n=3" \
  > target/scale_logs/r15_deltavar.log 2>&1
echo "r15_deltavar exit=$?" >> target/scale_logs/status15.txt
cp /tmp/graftscale/stream_curve.json target/scale_logs/r15_deltavar.json 2>/dev/null

echo ALL_DONE >> target/scale_logs/status15.txt
