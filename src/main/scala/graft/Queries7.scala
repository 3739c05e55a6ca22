package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.HashEmbedder
import graft.post.Highlight

/** Seventh bank (round 4): sentence-level semantic highlighting (batch +
  * span relation), widened DSL parameter surface, SEISMIC batch search. */
object Queries7 {

  import SparkEntry.{docsWithTokens, qTokensA}

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private val queryText = "spark join fast table scan"
  private def qEmb = HashEmbedder.embed(queryText, HashEmbedder.DefaultDim)

  private def topHits(s: SparkSession, dir: String): DataFrame =
    graft.sparse.SparseRetrieval.exactTopK(docsWithTokens(s, dir), qTokensA, 5)
      .join(t(s, dir, "documents").select(col("doc_id"), col("text")), "doc_id")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-sentence span relation: the observable form of the QA span model
    // output (SentenceHighlightingRequest → highlights list of start/end) —
    // segmentation offsets, similarity, and selection all oracle-checked
    "q_highlight_sentences" -> ((s, dir) =>
      Highlight.sentenceRelation(topHits(s, dir), queryText, "text")
        .select(col("doc_id"), col("ord"), col("sent_start"), col("sent_end"),
          round(col("sim"), 6).as("sim"), col("highlighted"))
        .orderBy(col("doc_id"), col("ord"))),

    // batch-mode processor (SemanticHighlightingProcessor/BatchExecutor):
    // sub-batches of max_inference_batch_size=2 through mapPartitions —
    // must emit the same relation as the single path
    "q_highlight_batch" -> ((s, dir) =>
      Highlight.highlightBatch(topHits(s, dir), queryText, "text",
        maxInferenceBatchSize = 2)
        .select(col("doc_id"), col("score"), col("highlights"))
        .orderBy(col("doc_id")))
  )

  def oracleSql: Map[String, String] = Map(
    "q_highlight_sentences" -> OracleGen.highlightSentencesSql(qTokensA, qEmb),
    // batch ≡ single: same oracle as q_highlight
    "q_highlight_batch" -> OracleGen.highlightTaggedSql(qTokensA, qEmb)
  )
}
