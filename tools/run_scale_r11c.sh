#!/bin/bash
# Round-11 third pass: re-measure the boilerplate capped/auto cells after
# the probe/strategy df-aggregation share (same replica dirs + protocol).
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=11
rm -f target/scale_logs/status11c.txt

sbt -batch "runMain graft.ScaleBench factors=1,3,10,30 passes=3 mode=boilerplate queries=q_dedup_winnow_capped,q_dedup_winnow_auto,q_dedup_ngram_capped,q_dedup_ngram_auto" \
  > target/scale_logs/r11c_boilerplate.log 2>&1
echo "r11c_boilerplate exit=$?" >> target/scale_logs/status11c.txt
cp /tmp/graftscale/scale_results_boilerplate.json target/scale_logs/r11c_boilerplate.json 2>/dev/null

echo ALL_DONE >> target/scale_logs/status11c.txt
