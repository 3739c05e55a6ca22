#!/bin/bash
# Round-10 third pass:
#   - q_dedup_ngram_auto measured in the shared and boilerplate regimes
#     (disjoint already measured) — the dispatcher must track the best
#     strategy per regime at scale, not just on the fixture;
#   - q_dedup_semantic disjoint curve (fixed-nlist form, the SparkEntry
#     query) + the ProfileSemantic fixed-vs-scaled nlist contrast;
#   - query-count sweep extended one octave (nq=10000).
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=10
rm -f target/scale_logs/status10c.txt

run() { # mode factors queries out_name
  sbt -batch "runMain graft.ScaleBench factors=$2 passes=3 mode=$1 queries=$3" \
    > target/scale_logs/$4.log 2>&1
  echo "$4 exit=$?" >> target/scale_logs/status10c.txt
  cp /tmp/graftscale/scale_results_$1.json target/scale_logs/$4.json 2>/dev/null
}

run shared 1,3,10,30 "q_dedup_ngram_auto" r10c_auto_shared
run boilerplate 1,3,10,30 "q_dedup_ngram_auto" r10c_auto_boilerplate
run disjoint 1,3,10,30 "q_dedup_semantic" r10c_semantic_disjoint

sbt -batch "runMain graft.ProfileSemantic factors=1,3,10,30 passes=3" \
  > target/scale_logs/r10c_semantic_contrast.log 2>&1
echo "r10c_semantic_contrast exit=$?" >> target/scale_logs/status10c.txt
cp /tmp/graftscale/scale_results_semantic.json target/scale_logs/r10c_semantic_contrast.json 2>/dev/null

sbt -batch "runMain graft.QsetBench nqs=1000,10000 passes=3 unionCap=100" \
  > target/scale_logs/r10c_qset10k.log 2>&1
echo "r10c_qset10k exit=$?" >> target/scale_logs/status10c.txt
cp /tmp/graftscale/scale_results_qset.json target/scale_logs/r10c_qset10k.json 2>/dev/null

echo ALL_DONE >> target/scale_logs/status10c.txt
