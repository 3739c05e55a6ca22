#!/bin/bash
# Round-11 eighth pass: embedding delta after the group-keyed index rewrite.
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=11
rm -f target/scale_logs/status11h.txt

sbt -batch "runMain graft.ScaleBench factors=1,3,10,30 passes=3 mode=disjoint queries=q_dedup_embedding_lsh,q_dedup_embedding_delta" \
  > target/scale_logs/r11h_disjoint.log 2>&1
echo "r11h_disjoint exit=$?" >> target/scale_logs/status11h.txt
cp /tmp/graftscale/scale_results_disjoint.json target/scale_logs/r11h_disjoint.json 2>/dev/null

echo ALL_DONE >> target/scale_logs/status11h.txt
