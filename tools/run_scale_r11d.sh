#!/bin/bash
# Round-11 fourth pass: delta dedup vs full re-dedup, disjoint regime
# (narrowed re-run over the existing replica dirs).
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=11
rm -f target/scale_logs/status11d.txt

sbt -batch "runMain graft.ScaleBench factors=1,3,10,30 passes=3 mode=disjoint queries=q_dedup_minhash,q_dedup_minhash_delta" \
  > target/scale_logs/r11d_disjoint.log 2>&1
echo "r11d_disjoint exit=$?" >> target/scale_logs/status11d.txt
cp /tmp/graftscale/scale_results_disjoint.json target/scale_logs/r11d_disjoint.json 2>/dev/null

echo ALL_DONE >> target/scale_logs/status11d.txt
