#!/bin/bash
# Round-16 measurement pass, ONE sequential session (never run sbt
# concurrently with a measurement; status lines to target/scale_logs).
# Produces, in priority order:
#   1. a full sf0.1 bench on the r16 code with the NEW contention probe
#      (VERDICT r15 task #2: per-query other-CPU share + loadavg stamped
#      into the JSON, CONTENDED self-flag) — run EARLY on a quiet host;
#      this is also the repo-root bench_out.json regeneration at sf0.1
#      (ADVICE r15 #1);
#   2. StreamCurve backfill (task #1 done-criterion: task-result bytes
#      shipped to the driver stay gate-bounded as a single batch grows
#      0.5M -> 6M pairs past the driver cutoff — the relational
#      over-cutoff fold path);
#   3. StreamCurve clampread (task #5: past-clamp pruned-READ
#      degradation — probe-fold wall + read bytes as rows/partition
#      grow x32 on a clamped toy grid);
#   4. StreamCurve probesplit x1/x10/x30 re-measured with the
#      median-pass counter pairing (ADVICE r15 #3 — the r15 cell mixed
#      the median wall with last-pass bytes);
#   5. StreamCurve aging (20 batches, all legs) — the round-over-round
#      debris/plateau series under the current counter names.
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=16
rm -f target/scale_logs/status16.txt

# 1. full sf0.1 bench, root artifact regenerated at sf0.1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench_out.json \
  sbt -batch "runMain graft.Bench" > target/scale_logs/r16_bench.log 2>&1
echo "r16_bench exit=$?" >> target/scale_logs/status16.txt
cp bench_out.json target/scale_logs/r16_bench_sf01.json 2>/dev/null

# 2+3. backfill + clampread (new r16 cells)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.StreamCurve cells=backfill,clampread" \
  > target/scale_logs/r16_backfill_clampread.log 2>&1
echo "r16_backfill_clampread exit=$?" >> target/scale_logs/status16.txt
cp /tmp/graftscale/stream_curve.json target/scale_logs/r16_backfill_clampread.json 2>/dev/null

# 4. probesplit with median-pass counters
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.StreamCurve cells=probesplit factors=1,10,30" \
  > target/scale_logs/r16_probesplit.log 2>&1
echo "r16_probesplit exit=$?" >> target/scale_logs/status16.txt
cp /tmp/graftscale/stream_curve.json target/scale_logs/r16_probesplit.json 2>/dev/null

# 5. aging refresh
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.StreamCurve cells=aging batches=20" \
  > target/scale_logs/r16_aging.log 2>&1
echo "r16_aging exit=$?" >> target/scale_logs/status16.txt
cp /tmp/graftscale/stream_curve.json target/scale_logs/r16_aging.json 2>/dev/null

echo "ALL DONE $(date)" >> target/scale_logs/status16.txt
