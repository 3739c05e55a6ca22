#!/bin/bash
# Round-9 second-pass scaling capture, after the SortedIntersectCount fix
# (native codegen merge-intersect in prefix/capped ngram verification):
#   - FULL disjoint re-run (the headline curve, one coherent stamp);
#   - narrowed shared/boilerplate re-measures for the two queries whose
#     code changed (prefix, capped) — merged into the earlier full-mode
#     files with per-query provenance;
#   - the three x30 octave runs re-measured at this commit.
# Reuses the existing replica dirs (_DONE markers). Run inside tmux.
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=9
rm -f target/scale_logs/status9b.txt

R9_DISJOINT="q_dedup_exact,q_dedup_minhash,q_dedup_ngram,q_dedup_ngram_capped,q_dedup_ngram_prefix,q_dedup_simhash,q_dedup_clusters,q_ann_cosine,q_ann_ivf,q_ann_ivf_pruned,q_mllib_minhash,q_seismic,q_seismic_batch,q_sparse_exact,q_sparse_batch,q_hybrid_minmax_arith,q_hybrid_rrf,q_text_quality,q_dedup_winnow,q_dedup_winnow_capped,q_mix_temperature,q_corpus_filter,q_vocab_top,q_dedup_substring,q_dedup_excise,q_embedding_outliers,q_split_assign,q_token_commonness,q_source_stats"
X30="q_hybrid_minmax_arith,q_seismic,q_dedup_ngram_prefix,q_dedup_ngram_capped"

run() { # mode factors queries out_name
  sbt -batch "runMain graft.ScaleBench factors=$2 passes=3 mode=$1 queries=$3" \
    > target/scale_logs/$4.log 2>&1
  echo "$4 exit=$?" >> target/scale_logs/status9b.txt
  cp /tmp/graftscale/scale_results_$1.json target/scale_logs/$4.json 2>/dev/null
}

run disjoint 1,3,10 "$R9_DISJOINT" r9b_disjoint
run shared 1,3,10 "q_dedup_ngram_prefix,q_dedup_ngram_capped" r9b_shared_fix
run boilerplate 1,3,10 "q_dedup_ngram_prefix,q_dedup_ngram_capped" r9b_boilerplate_fix
run disjoint 1,3,10,30 "$X30" r9b_x30_disjoint
run shared 1,3,10,30 "q_dedup_ngram_prefix,q_dedup_ngram_capped" r9b_x30_shared
run boilerplate 1,3,10,30 "q_dedup_ngram_prefix,q_dedup_ngram_capped" r9b_x30_boilerplate

echo ALL_DONE >> target/scale_logs/status9b.txt
