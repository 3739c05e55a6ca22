#!/bin/bash
# Round-14 follow-up batch: isolated profile of the embedding delta trio
# (the in-bench +69% q_dedup_embedding_delta_scaled question — isolated
# medians are the comparable number), then the re-cut embedding probe
# (writeScaled seeding — the first cut's fixed nbits=4 grid went
# quadratically hot at x30 and spilled the disk) plus the aging and
# gatevar cells the first StreamCurve run died before reaching.
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=14
rm -f target/scale_logs/status14b.txt

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Profile passes=5 q_dedup_embedding_delta q_dedup_embedding_delta_capped q_dedup_embedding_delta_scaled" \
  > target/scale_logs/r14_profile_emb.log 2>&1
echo "r14_profile_emb exit=$?" >> target/scale_logs/status14b.txt

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.StreamCurve cells=probe legs=embedding factors=1,10,30" \
  > target/scale_logs/r14_streamcurve_emb.log 2>&1
echo "r14_streamcurve_emb exit=$?" >> target/scale_logs/status14b.txt
cp /tmp/graftscale/stream_curve.json target/scale_logs/r14_streamcurve_emb.json 2>/dev/null

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.StreamCurve cells=aging,gatevar batches=20 gatevar_n=3" \
  > target/scale_logs/r14_streamcurve_ag.log 2>&1
echo "r14_streamcurve_ag exit=$?" >> target/scale_logs/status14b.txt
cp /tmp/graftscale/stream_curve.json target/scale_logs/r14_streamcurve_ag.json 2>/dev/null

echo ALL_DONE >> target/scale_logs/status14b.txt
