#!/bin/bash
cd /root/repo
export SPARK_DRIVER_MEM=24g
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=target/scale_logs/r16final_bench_sf01.json \
  sbt -batch "runMain graft.Bench" > target/scale_logs/r16final_bench.log 2>&1
echo "r16final_bench exit=$?" >> target/scale_logs/status16.txt
