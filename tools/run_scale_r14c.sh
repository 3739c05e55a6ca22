#!/bin/bash
# Round-14 third batch: probe cells re-cut with a corpus-scaled assignment
# grid (SeedTargetRows — the production per-partition-size posture at toy
# scale), so the fold byte curve measures the fold, not the 8-partition
# floor.
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=14
rm -f target/scale_logs/status14c.txt

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.StreamCurve cells=probe factors=1,10,30" \
  > target/scale_logs/r14_streamcurve_grid.log 2>&1
echo "r14_streamcurve_grid exit=$?" >> target/scale_logs/status14c.txt
cp /tmp/graftscale/stream_curve.json target/scale_logs/r14_streamcurve_grid.json 2>/dev/null

echo ALL_DONE >> target/scale_logs/status14c.txt
