#!/bin/bash
# Round-17 measurement pass, ONE sequential tmux session (never run sbt
# concurrently with a measurement; status lines to target/scale_logs).
# Produces, in priority order:
#   1. a full sf0.1 bench on the r17 code with the NEW all-cores anchor +
#      in-run sampling + anchor-normalized totals (VERDICT r16 task #1);
#      also regenerates the repo-root bench_out.json at sf0.1;
#   2. StreamCurve clampread REBUILT (task #3: incompressible
#      hash-scrambled ids, page-dominated partitions — the read slope the
#      r16 cell could not see under footer-dominated toy files);
#   3. QuantBench (task #6 evidence: the byte-quantized prefilter A/B in
#      the gate regime AND a high-candidate-volume regime);
#   4. attribution A/B for the r15->r16 clustered-stream quiet-cell
#      regression (task #5): Profile the winnow cluster leg + the
#      non-cluster embedding leg at b0acf39 (r15 close) vs f4690e7 (the
#      fold-restructure + lock commit) vs r17 HEAD, anchors around each;
#   5. StreamCurve aging refresh (the round-over-round plateau series).
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=17
rm -f target/scale_logs/status17.txt
HEAD_SHA=$(git rev-parse HEAD)

echo "window health:" >> target/scale_logs/status17.txt
java tools/Anchor.java 3 >> target/scale_logs/status17.txt 2>/dev/null

# 1. full sf0.1 bench, root artifact regenerated at sf0.1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench_out.json \
  sbt -batch "runMain graft.Bench" > target/scale_logs/r17_bench.log 2>&1
echo "r17_bench exit=$?" >> target/scale_logs/status17.txt
cp bench_out.json target/scale_logs/r17_bench_sf01.json 2>/dev/null

# 2. clampread rebuilt (incompressible ids, big partitions)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.StreamCurve cells=clampread" \
  > target/scale_logs/r17_clampread.log 2>&1
echo "r17_clampread exit=$?" >> target/scale_logs/status17.txt
cp /tmp/graftscale/stream_curve.json target/scale_logs/r17_clampread.json 2>/dev/null

# 3. quantized-prefilter A/B (gate + volume regimes)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.QuantBench passes=5 out=target/scale_logs/r17_quant.json" \
  > target/scale_logs/r17_quant.log 2>&1
echo "r17_quant exit=$?" >> target/scale_logs/status17.txt

# 4. attribution A/B across commits (winnow cluster leg is the clean
# comparator — its per-batch path is byte-identical r16->r17)
cp tools/Anchor.java target/scale_logs/Anchor.java  # survives checkouts
for C in b0acf39 f4690e7 $HEAD_SHA; do
  git checkout -q $C || break
  echo "== commit $C" >> target/scale_logs/r17_ab.log
  java target/scale_logs/Anchor.java 2 >> target/scale_logs/r17_ab.log 2>/dev/null
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    sbt -batch "runMain graft.Profile passes=7 q_stream_dedup_clusters_winnow q_stream_dedup_embedding" 2>/dev/null \
    | grep profile >> target/scale_logs/r17_ab.log
done
git checkout -q $HEAD_SHA
echo "r17_ab done (restored $HEAD_SHA)" >> target/scale_logs/status17.txt

# 5. aging refresh
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.StreamCurve cells=aging batches=20" \
  > target/scale_logs/r17_aging.log 2>&1
echo "r17_aging exit=$?" >> target/scale_logs/status17.txt
cp /tmp/graftscale/stream_curve.json target/scale_logs/r17_aging.json 2>/dev/null

echo "ALL DONE $(date)" >> target/scale_logs/status17.txt
