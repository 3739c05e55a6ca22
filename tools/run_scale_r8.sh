#!/bin/bash
# Round-8 scaling-curve capture: all three ScaleBench modes, sequentially.
# Run inside tmux (survives tool-call timeouts); logs + status land under
# target/scale_logs/ which is shared across sandbox boundaries.
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=8
rm -f target/scale_logs/status.txt
for mode in disjoint shared boilerplate; do
  sbt -batch "runMain graft.ScaleBench factors=1,3,10 passes=3 mode=$mode" \
    > target/scale_logs/$mode.log 2>&1
  rc=$?
  cp /tmp/graftscale/scale_results_$mode.json target/scale_logs/ 2>/dev/null
  echo "mode=$mode exit=$rc" >> target/scale_logs/status.txt
done
echo ALL_DONE >> target/scale_logs/status.txt
