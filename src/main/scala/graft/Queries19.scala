package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{EmbeddingIndex, MinhashIndex, WinnowIndex}

/** Nineteenth bank (round 14): file-count COMPACTION as an oracle-gated
  * operator on all three written dedup indexes. The production loop this
  * pins: a long streaming ingest appends one file per touched partition
  * per micro-batch, so an index accumulates thousands of small files;
  * `compact` merges oversized partition leaves offline (the Lucene
  * segment-merge analogue — reference `codec/MergeHelper.java` — as a
  * partition-leaf rewrite, [[graft.dedup.IndexCompaction]]).
  *
  * Gate shape: build the index INCREMENTALLY (write one slice, append the
  * rest in pieces — real append debris), compact every leaf down to merged
  * files, then run the SAME delta search as the q_dedup_*_delta gates.
  * Compaction must be invisible to query semantics, so each gate rides its
  * delta sibling's DERIVED oracle verbatim (the Queries15/16 anti-drift
  * protocol: the base content — everything outside the %10==7 delta — and
  * the delta split match the sibling exactly). The measured win lives in
  * SCALE.md round 14: 808 → 8 files, 3.7 → 0.4 MB per pruned probe after
  * 100 appends. */
object Queries19 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Base = everything outside the delta split, arriving as one write plus
    * three appends (append debris is the point); compact(maxFiles = 1)
    * forces every multi-file leaf through the merge. */
  private def builtCompacted(s: SparkSession, prefix: String,
      write: (DataFrame, String) => Unit, append: (DataFrame, String) => Unit,
      compact: String => Int, base: DataFrame, splitCol: String): String = {
    val root = SparkEntry.streamScratchDir(prefix)
    val idx = s"$root/index"
    write(base.where(col(splitCol) % 3 === 0), idx)
    (1 to 2).foreach { r =>
      append(base.where(col(splitCol) % 3 === r), idx)
    }
    compact(idx)
    idx
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_minhash_delta_compacted" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idx = builtCompacted(s, "mh_compactgate",
        (df, p) => MinhashIndex.write(df, p),
        (df, p) => MinhashIndex.append(df, p),
        p => MinhashIndex.compact(s, p, maxFiles = 1),
        docs.where(col("doc_id") % 10 =!= 7), "doc_id")
      MinhashIndex.deltaPairs(s, idx,
        docs.where(col("doc_id") % 10 === 7), threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q_dedup_winnow_delta_compacted" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idx = builtCompacted(s, "wn_compactgate",
        (df, p) => WinnowIndex.write(df, p,
          k = Queries12.WinnowK, w = Queries12.WinnowW),
        (df, p) => WinnowIndex.append(df, p),
        p => WinnowIndex.compact(s, p, maxFiles = 1),
        docs.where(col("doc_id") % 10 =!= 7), "doc_id")
      WinnowIndex.deltaPairs(s, idx,
        docs.where(col("doc_id") % 10 === 7),
        minShared = Queries12.WinnowMinShared)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q_dedup_embedding_delta_compacted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idx = builtCompacted(s, "em_compactgate",
        (df, p) => EmbeddingIndex.write(df, p, dim = 64, nbits = 4, tables = 8),
        (df, p) => EmbeddingIndex.append(df, p),
        p => EmbeddingIndex.compact(s, p, maxFiles = 1),
        emb.where(col("vec_id") % 10 =!= 7), "vec_id")
      EmbeddingIndex.deltaPairs(s, idx,
        emb.where(col("vec_id") % 10 === 7), threshold = 0.45)
        .orderBy(col("id_a"), col("id_b"))
    }))

  // compaction is semantically invisible: each gate rides its delta
  // sibling's derived oracle VERBATIM (same base content, same delta split)
  def oracleSql: Map[String, String] = Map(
    "q_dedup_minhash_delta_compacted" ->
      Queries16.oracleSql("q_dedup_minhash_delta"),
    "q_dedup_winnow_delta_compacted" ->
      Queries16.oracleSql("q_dedup_winnow_delta"),
    "q_dedup_embedding_delta_compacted" ->
      Queries16.oracleSql("q_dedup_embedding_delta"))
}
