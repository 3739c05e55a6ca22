#!/bin/bash
# Round-11 seventh pass: embedding delta vs full embedding LSH, disjoint.
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=11
rm -f target/scale_logs/status11g.txt

sbt -batch "runMain graft.ScaleBench factors=1,3,10,30 passes=3 mode=disjoint queries=q_decontaminate_embedding_lsh,q_dedup_embedding_lsh,q_dedup_embedding_delta" \
  > target/scale_logs/r11g_disjoint.log 2>&1
echo "r11g_disjoint exit=$?" >> target/scale_logs/status11g.txt
cp /tmp/graftscale/scale_results_disjoint.json target/scale_logs/r11g_disjoint.json 2>/dev/null

echo ALL_DONE >> target/scale_logs/status11g.txt
