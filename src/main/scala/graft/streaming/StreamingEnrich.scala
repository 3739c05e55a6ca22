package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ingest.Enrich
import graft.text.TextAnalysis

/** Structured-Streaming ingest: the same enrichment pipeline the batch path
  * uses (chunk → embed → encode → quality signals), applied to a streaming
  * DataFrame. The reference is batch-only (ingest happens per bulk request);
  * streaming ingest is the natural Spark extension for continuous corpus
  * builds — `readStream` → enrich → `writeStream` into the corpus table.
  *
  * All enrichment transforms are stateless projections, so they run
  * unchanged on a stream (no watermark needed). The windowed aggregation
  * demonstrates stateful processing: per-source document counts over event
  * time with a watermark bounding state.
  */
object StreamingEnrich {

  /** Stateless enrichment — identical logic for batch and stream frames. */
  def enrich(docs: DataFrame, dim: Int = Enrich.DefaultDim): DataFrame = {
    val enriched = docs
      .withColumn("embedding", Enrich.embedUdf(dim)(col("text")))
      .withColumn("tokens", Enrich.encodeUdf(col("text")))
    TextAnalysis.langId(enriched)
      .select(docs.columns.map(col) ++ Seq(
        col("embedding"), col("tokens"), col("pred_lang")): _*)
  }

  /** Stateful demo: per-(source, window) doc counts with a watermark.
    * Requires an event-time column `ts`. */
  def countsPerSourceWindow(docs: DataFrame, windowDuration: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .groupBy(col("source"), window(col("ts"), windowDuration))
      .agg(count(lit(1)).as("n_docs"), avg(length(col("text"))).as("avg_len"))
}
