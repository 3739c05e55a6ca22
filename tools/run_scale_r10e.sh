#!/bin/bash
# Round-10 fifth pass: the sparse batch written-index contrast pair
# (q_sparse_batch in-memory scan vs q_sparse_batch_pruned bucket-pruned
# written index) on the disjoint curve — the q_ann_ivf / q_ann_ivf_pruned
# evidence protocol.
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=10
rm -f target/scale_logs/status10e.txt

sbt -batch "runMain graft.ScaleBench factors=1,3,10,30 passes=3 mode=disjoint queries=q_sparse_batch,q_sparse_batch_pruned" \
  > target/scale_logs/r10e_sparsepruned_disjoint.log 2>&1
echo "r10e exit=$?" >> target/scale_logs/status10e.txt
cp /tmp/graftscale/scale_results_disjoint.json target/scale_logs/r10e_sparsepruned_disjoint.json 2>/dev/null
echo ALL_DONE >> target/scale_logs/status10e.txt
