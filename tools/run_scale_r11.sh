#!/bin/bash
# Round-11 measurement pass, ONE sequential session (the r10 protocol:
# never run sbt concurrently with a measurement; status lines to
# target/scale_logs). Produces:
#   1. the clean same-session boilerplate curve capped/auto/prefix
#      (retires the r10d cross-environment watch; also the shared-shingle
#      probe fix evidence: auto should now track capped closely),
#   2. shared-regime winnow/embedding_lsh re-measure with the two-quiet-
#      read metrics listener (counter-verification input),
#   3. the semantic-dedup contrast incl. the gated AUTO path
#      (ProfileSemantic; needs the disjoint replicas, built first),
#   4. the qset axis at 1k/10k with chunked scoreBatchSparse.
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=11
rm -f target/scale_logs/status11.txt

sbt -batch "runMain graft.ScaleBench factors=1,3,10,30 passes=3 mode=boilerplate queries=q_dedup_ngram_capped,q_dedup_ngram_auto,q_dedup_ngram_prefix" \
  > target/scale_logs/r11_boilerplate.log 2>&1
echo "r11_boilerplate exit=$?" >> target/scale_logs/status11.txt
cp /tmp/graftscale/scale_results_boilerplate.json target/scale_logs/r11_boilerplate.json 2>/dev/null

sbt -batch "runMain graft.ScaleBench factors=1,3,10,30 passes=3 mode=shared queries=q_dedup_winnow,q_dedup_embedding_lsh" \
  > target/scale_logs/r11_shared.log 2>&1
echo "r11_shared exit=$?" >> target/scale_logs/status11.txt
cp /tmp/graftscale/scale_results_shared.json target/scale_logs/r11_shared.json 2>/dev/null

# cheap disjoint pass to build the x1..x30 replica dirs ProfileSemantic reads
sbt -batch "runMain graft.ScaleBench factors=1,3,10,30 passes=1 mode=disjoint queries=q_dedup_exact" \
  > target/scale_logs/r11_disjoint_seed.log 2>&1
echo "r11_disjoint_seed exit=$?" >> target/scale_logs/status11.txt

sbt -batch "runMain graft.ProfileSemantic factors=1,3,10,30 passes=3" \
  > target/scale_logs/r11_semantic.log 2>&1
echo "r11_semantic exit=$?" >> target/scale_logs/status11.txt
cp /tmp/graftscale/scale_results_semantic.json target/scale_logs/r11_semantic.json 2>/dev/null

sbt -batch "runMain graft.QsetBench nqs=1000,10000 passes=3 unionCap=100" \
  > target/scale_logs/r11_qset.log 2>&1
echo "r11_qset exit=$?" >> target/scale_logs/status11.txt
cp /tmp/graftscale/scale_results_qset.json target/scale_logs/r11_qset.json 2>/dev/null

echo ALL_DONE >> target/scale_logs/status11.txt
