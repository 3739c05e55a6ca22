#!/bin/bash
# Round-11 second pass: winnow collapse + auto, narrowed re-runs over the
# existing replica dirs (same sequential-session protocol).
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=11
rm -f target/scale_logs/status11b.txt

sbt -batch "runMain graft.ScaleBench factors=1,3,10,30 passes=3 mode=shared queries=q_dedup_winnow,q_dedup_winnow_auto" \
  > target/scale_logs/r11b_shared.log 2>&1
echo "r11b_shared exit=$?" >> target/scale_logs/status11b.txt
cp /tmp/graftscale/scale_results_shared.json target/scale_logs/r11b_shared.json 2>/dev/null

sbt -batch "runMain graft.ScaleBench factors=1,3,10,30 passes=3 mode=boilerplate queries=q_dedup_winnow_capped,q_dedup_winnow_auto" \
  > target/scale_logs/r11b_boilerplate.log 2>&1
echo "r11b_boilerplate exit=$?" >> target/scale_logs/status11b.txt
cp /tmp/graftscale/scale_results_boilerplate.json target/scale_logs/r11b_boilerplate.json 2>/dev/null

echo ALL_DONE >> target/scale_logs/status11b.txt
