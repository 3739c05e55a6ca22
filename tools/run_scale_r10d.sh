#!/bin/bash
# Round-10 fourth pass: re-run the fixed nq=10000 qset octave, the
# apples-to-apples capped boilerplate cells for the auto-dispatch
# comparison, and a re-check of the anomalous semantic x10 scaled cell.
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=10
rm -f target/scale_logs/status10d.txt

sbt -batch "runMain graft.ScaleBench factors=1,3,10,30 passes=3 mode=boilerplate queries=q_dedup_ngram_capped" \
  > target/scale_logs/r10d_capped_boilerplate.log 2>&1
echo "r10d_capped_boilerplate exit=$?" >> target/scale_logs/status10d.txt
cp /tmp/graftscale/scale_results_boilerplate.json target/scale_logs/r10d_capped_boilerplate.json 2>/dev/null

sbt -batch "runMain graft.QsetBench nqs=1000,10000 passes=3 unionCap=100" \
  > target/scale_logs/r10d_qset10k.log 2>&1
echo "r10d_qset10k exit=$?" >> target/scale_logs/status10d.txt
cp /tmp/graftscale/scale_results_qset.json target/scale_logs/r10d_qset10k.json 2>/dev/null

sbt -batch "runMain graft.ProfileSemantic factors=10 passes=3" \
  > target/scale_logs/r10d_semantic_x10.log 2>&1
echo "r10d_semantic_x10 exit=$?" >> target/scale_logs/status10d.txt

echo ALL_DONE >> target/scale_logs/status10d.txt
