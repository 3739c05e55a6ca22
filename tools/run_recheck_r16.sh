#!/bin/bash
cd /root/repo
export SPARK_DRIVER_MEM=24g
sbt -batch test > target/scale_logs/r16_test2.log 2>&1
echo "r16_test2 exit=$?" >> target/scale_logs/status16.txt
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_BENCH_OUT=target/scale_logs/r16c_bench_sf0001.json \
  sbt -batch "runMain graft.Bench" > target/scale_logs/r16c_bench.log 2>&1
echo "r16c_bench exit=$?" >> target/scale_logs/status16.txt
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
  sbt -batch "runMain graft.StreamCurve cells=clampread clampread_doublings=2" \
  > target/scale_logs/r16_sc_smoke.log 2>&1
echo "r16_sc_smoke exit=$?" >> target/scale_logs/status16.txt
cp /tmp/graftscale/stream_curve.json target/scale_logs/r16_sc_smoke.json 2>/dev/null
echo "RECHECK DONE $(date)" >> target/scale_logs/status16.txt
