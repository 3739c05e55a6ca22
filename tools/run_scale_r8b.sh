#!/bin/bash
# Round-8 second-pass scaling capture: NARROWED runs for the new operators
# (winnow dedup family, temperature mix, corpus filter, vocab). Reuses the
# existing replica dirs (_DONE markers). Run inside tmux; logs + artifacts
# land under target/scale_logs/ (shared across sandbox boundaries).
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=8
rm -f target/scale_logs/status2.txt

sbt -batch "runMain graft.ScaleBench factors=1,3,10 passes=3 mode=disjoint queries=q_dedup_winnow,q_dedup_winnow_capped,q_mix_temperature,q_corpus_filter,q_vocab_top" \
  > target/scale_logs/disjoint2.log 2>&1
echo "disjoint exit=$?" >> target/scale_logs/status2.txt
cp /tmp/graftscale/scale_results_disjoint.json target/scale_logs/disjoint2.json 2>/dev/null

sbt -batch "runMain graft.ScaleBench factors=1,3,10 passes=3 mode=shared queries=q_dedup_winnow,q_dedup_winnow_capped" \
  > target/scale_logs/shared2.log 2>&1
echo "shared exit=$?" >> target/scale_logs/status2.txt
cp /tmp/graftscale/scale_results_shared.json target/scale_logs/shared2.json 2>/dev/null

sbt -batch "runMain graft.ScaleBench factors=1,3,10 passes=3 mode=boilerplate queries=q_dedup_winnow_capped" \
  > target/scale_logs/boilerplate2.log 2>&1
echo "boilerplate exit=$?" >> target/scale_logs/status2.txt
cp /tmp/graftscale/scale_results_boilerplate.json target/scale_logs/boilerplate2.json 2>/dev/null

echo ALL_DONE >> target/scale_logs/status2.txt
