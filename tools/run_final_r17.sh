#!/bin/bash
# Round-17 close-out session: probesplit re-measured with the FIXED read
# counter (the r15/r16 "96%+ candidate-driven" split was computed from
# footer-only bytes — re-derive it from true read volumes), then the
# round-close bench on final HEAD (refreshes the repo-root artifact).
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g
rm -f target/scale_logs/status17f.txt
java tools/Anchor.java 2 >> target/scale_logs/status17f.txt 2>/dev/null

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.StreamCurve cells=probesplit factors=1,10,30" \
  > target/scale_logs/r17_probesplit.log 2>&1
echo "r17_probesplit exit=$?" >> target/scale_logs/status17f.txt
cp /tmp/graftscale/stream_curve.json target/scale_logs/r17_probesplit.json 2>/dev/null

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench_out.json \
  sbt -batch "runMain graft.Bench" > target/scale_logs/r17final_bench.log 2>&1
echo "r17final_bench exit=$?" >> target/scale_logs/status17f.txt
cp bench_out.json target/scale_logs/r17final_bench_sf01.json 2>/dev/null
java tools/Anchor.java 2 >> target/scale_logs/status17f.txt 2>/dev/null
echo "FINAL DONE $(date)" >> target/scale_logs/status17f.txt
