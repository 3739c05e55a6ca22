#!/bin/bash
# Round-11 fifth pass: winnow delta vs full winnow, disjoint regime
# (narrowed re-run over the existing replica dirs).
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=11
rm -f target/scale_logs/status11e.txt

sbt -batch "runMain graft.ScaleBench factors=1,3,10,30 passes=3 mode=disjoint queries=q_dedup_winnow,q_dedup_winnow_delta" \
  > target/scale_logs/r11e_disjoint.log 2>&1
echo "r11e_disjoint exit=$?" >> target/scale_logs/status11e.txt
cp /tmp/graftscale/scale_results_disjoint.json target/scale_logs/r11e_disjoint.json 2>/dev/null

echo ALL_DONE >> target/scale_logs/status11e.txt
