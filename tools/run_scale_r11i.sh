#!/bin/bash
# Round-11 ninth pass: minhash delta in the boilerplate regime — uncapped
# gate config vs the maxBucket lever vs the batch forms.
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=11
rm -f target/scale_logs/status11i.txt

sbt -batch "runMain graft.ScaleBench factors=1,3,10,30 passes=3 mode=boilerplate queries=q_dedup_minhash_capped,q_dedup_minhash_delta,q_dedup_minhash_delta_capped" \
  > target/scale_logs/r11i_boilerplate.log 2>&1
echo "r11i_boilerplate exit=$?" >> target/scale_logs/status11i.txt
cp /tmp/graftscale/scale_results_boilerplate.json target/scale_logs/r11i_boilerplate.json 2>/dev/null

echo ALL_DONE >> target/scale_logs/status11i.txt
