#!/bin/bash
# Round-9 scaling-curve capture:
#   1. the three r8 regimes re-measured at 1,3,10 (same query sets as the
#      r8 artifacts, PLUS q_ann_ivf_pruned on the disjoint curve and
#      q_decontaminate_embedding_lsh on the tdata curve) — the prefix-dedup
#      window flatten and the IVF pruned path are the deltas under test;
#   2. x30 cells for the flagship retrieval path and the two dedup scale
#      paths (prefix, capped) in every regime — one more octave past the
#      x10 the 100 TB story previously extrapolated from.
# Run inside tmux (survives tool-call timeouts); logs + status land under
# target/scale_logs/.
cd /root/repo
mkdir -p target/scale_logs
export SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=9
rm -f target/scale_logs/status9.txt

R8_DISJOINT="q_dedup_exact,q_dedup_minhash,q_dedup_ngram,q_dedup_ngram_capped,q_dedup_ngram_prefix,q_dedup_simhash,q_dedup_clusters,q_ann_cosine,q_ann_ivf,q_ann_ivf_pruned,q_mllib_minhash,q_seismic,q_seismic_batch,q_sparse_exact,q_sparse_batch,q_hybrid_minmax_arith,q_hybrid_rrf,q_text_quality,q_dedup_winnow,q_dedup_winnow_capped,q_mix_temperature,q_corpus_filter,q_vocab_top,q_dedup_substring,q_dedup_excise,q_embedding_outliers,q_split_assign,q_token_commonness,q_source_stats"
TDATA="q_decontaminate,q_pack_greedy,q_sample_stratified,q_dedup_keep,q_quality_repetition,q_decontaminate_embedding,q_decontaminate_embedding_lsh,q_dedup_winnow,q_dedup_winnow_capped,q_mix_temperature,q_corpus_filter,q_vocab_top,q_dedup_substring,q_dedup_excise,q_embedding_outliers,q_split_assign,q_token_commonness,q_source_stats"
X30="q_hybrid_minmax_arith,q_seismic,q_dedup_ngram_prefix,q_dedup_ngram_capped"

run() { # mode factors queries out_name
  sbt -batch "runMain graft.ScaleBench factors=$2 passes=3 mode=$1 queries=$3" \
    > target/scale_logs/$4.log 2>&1
  echo "$4 exit=$?" >> target/scale_logs/status9.txt
  cp /tmp/graftscale/scale_results_$1.json target/scale_logs/$4.json 2>/dev/null
}

# the three r8-shape regimes (defaults for shared/boilerplate)
run disjoint 1,3,10 "$R8_DISJOINT" r9_disjoint
sbt -batch "runMain graft.ScaleBench factors=1,3,10 passes=3 mode=shared" \
  > target/scale_logs/r9_shared.log 2>&1
echo "r9_shared exit=$?" >> target/scale_logs/status9.txt
cp /tmp/graftscale/scale_results_shared.json target/scale_logs/r9_shared.json 2>/dev/null
sbt -batch "runMain graft.ScaleBench factors=1,3,10 passes=3 mode=boilerplate" \
  > target/scale_logs/r9_boilerplate.log 2>&1
echo "r9_boilerplate exit=$?" >> target/scale_logs/status9.txt
cp /tmp/graftscale/scale_results_boilerplate.json target/scale_logs/r9_boilerplate.json 2>/dev/null

# training-data curve (tdata)
run disjoint 1,3,10 "$TDATA" r9_tdata

# x30 octave for the flagship + dedup scale paths, all three regimes
run disjoint 1,3,10,30 "$X30" r9_x30_disjoint
run shared 1,3,10,30 "q_dedup_ngram_prefix,q_dedup_ngram_capped" r9_x30_shared
run boilerplate 1,3,10,30 "q_dedup_ngram_prefix,q_dedup_ngram_capped" r9_x30_boilerplate

echo ALL_DONE >> target/scale_logs/status9.txt
