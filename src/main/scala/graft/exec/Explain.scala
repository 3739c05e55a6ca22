package graft.exec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model._

/** hybrid_score_explanation (processor/ExplanationResponseProcessor.java:
  * 39-198; fragments collected at NormalizationProcessorWorkflow.java:
  * 175-216): carry per-subquery raw and normalized scores through the
  * pipeline and emit them as an `explain` struct per result row —
  * `{technique, details: [{subq, raw_score, norm_score}]}`.
  */
object Explain {

  /** Hybrid pipeline keeping explanation fragments. Input: scored relation
    * [query_id, subq, doc_id, score]; output: results + `explain` struct. */
  def runWithExplain(
      scored: DataFrame,
      numSubqueries: Int,
      norm: NormalizationSpec,
      comb: CombinationSpec,
      paginationDepth: Option[Int] = None,
      from: Int = 0,
      size: Int = HybridLimits.DefaultK,
      minScore: Option[Double] = None,
      collapse: Option[(DataFrame, Int)] = None,
      postFilter: Option[DataFrame] = None): DataFrame = {
    HybridValidation.validate(numSubqueries, norm, comb, paginationDepth)
    val k = paginationDepth.getOrElse(from + size)
    val candidates = HybridPipeline.perSubqueryTopK(scored, k)
      .withColumn("raw_score", col("score"))
    val normalized = Normalization.normalize(candidates, norm)
    val fragments = normalized
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sort_array(collect_list(struct(
        col("subq"), col("raw_score"), col("score").as("norm_score")))).as("details"))
    val combined = Combination.combine(
      normalized.select(col("query_id"), col("subq"), col("doc_id"), col("score")), comb)
    // post_filter, min_score floor and collapse must apply here exactly as
    // in HybridPipeline.run — explain is an OUTPUT decoration, never a
    // different result set than the unexplained query
    val postFiltered = postFilter match {
      case Some(ids) => combined.join(ids.select(col("doc_id")), Seq("doc_id"), "left_semi")
      case None      => combined
    }
    val floored = minScore match {
      case Some(ms) => postFiltered.where(col("score") >= ms)
      case None     => postFiltered
    }
    val collapsed = collapse match {
      case Some((keys, docsPerGroup)) =>
        val wc = Window.partitionBy(col("query_id"), col("collapse_key"))
          .orderBy(col("score").desc, col("doc_id").asc)
        floored
          .join(keys, Seq("doc_id"), "left")
          .withColumn("__gr", row_number().over(wc))
          .where(col("__gr") <= docsPerGroup)
          .drop("__gr", "collapse_key")
      case None => floored
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val technique = s"normalization [${norm.name}], combination [${comb.name}]"
    collapsed
      .withColumn("rank", row_number().over(w))
      .where(col("rank") > from && col("rank") <= from + size)
      .join(fragments, Seq("query_id", "doc_id"), "left")
      .withColumn("explain", struct(lit(technique).as("technique"), col("details")))
      .drop("details")
  }
}
