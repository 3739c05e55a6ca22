package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model._

/** Score combination: fold the per-subquery normalized scores of each
  * (query, doc) into one final score (SURVEY.md §2.4).
  *
  * Skip semantics transcribed from the reference: a document absent from a
  * subquery's result set contributes NOTHING — neither score nor weight
  * (reference encodes absence as score < 0 and skips it,
  * ArithmeticMeanScoreCombinationTechnique.java:43-58). In the relational
  * form absence is simply a missing row, so a plain groupBy aggregation has
  * exactly the right semantics.
  *
  *   - arithmetic_mean: Σ wᵢsᵢ / Σ wᵢ          (skip sᵢ < 0 / absent)
  *   - geometric_mean:  exp(Σ wᵢ ln sᵢ / Σ wᵢ)  (skip sᵢ <= 0)
  *   - harmonic_mean:   Σ wᵢ / Σ (wᵢ/sᵢ)        (skip sᵢ <= 0)
  *   - rrf:             Σ wᵢsᵢ — a weighted SUM, not a mean
  *                      (RRFScoreCombinationTechnique.java:40-56)
  * All techniques return 0.0 when every subquery was skipped (ZERO_SCORE).
  */
object Combination {

  /** Input: [query_id, subq, doc_id, score] (normalized). Output: [query_id, doc_id, score]. */
  def combine(df: DataFrame, spec: CombinationSpec): DataFrame = {
    val weights = CombinationSpec.weightsOf(spec)
    val w: Column = weights match {
      case Some(ws) => element_at(lit(ws.toArray), col("subq") + 1) // subq is 0-based
      case None     => lit(1.0)
    }
    val s = col("score")
    val keys = Seq(col("query_id"), col("doc_id"))

    val combined: DataFrame = spec match {
      case _: CombinationSpec.ArithmeticMean =>
        val keep = s >= 0.0
        // zero-weight guard: a kept row with weight 0.0 makes the weight
        // sum 0 (not null) — the reference returns ZERO_SCORE, and 0/0
        // must never reach the Divide (NaN, or an error under ANSI)
        df.groupBy(keys: _*).agg(
          coalesce(sum(when(keep, w * s)), lit(0.0)).as("__cs"),
          sum(when(keep, w)).as("__sw"))
          .withColumn("score",
            when(col("__sw").isNull || col("__sw") === 0.0, lit(0.0))
              .otherwise(col("__cs") / col("__sw")))
      case _: CombinationSpec.GeometricMean =>
        val keep = s > 0.0
        df.groupBy(keys: _*).agg(
          exp(coalesce(sum(when(keep, w * log(s))), lit(0.0)) /
            sum(when(keep, w))).as("__c"),
          sum(when(keep, w)).as("__sw"))
          .withColumn("score", when(col("__sw").isNull || col("__sw") === 0.0, lit(0.0)).otherwise(col("__c")))
      case _: CombinationSpec.HarmonicMean =>
        val keep = s > 0.0
        df.groupBy(keys: _*).agg(
          sum(when(keep, w)).as("__sw"),
          sum(when(keep, w / s)).as("__sh"))
          .withColumn(
            "score",
            when(col("__sh").isNull || !(col("__sh") > 0.0), lit(0.0))
              .otherwise(col("__sw") / col("__sh")))
      case _: CombinationSpec.RRF =>
        val keep = s >= 0.0
        df.groupBy(keys: _*).agg(
          coalesce(sum(when(keep, w * s)), lit(0.0)).as("score"))
    }
    combined.select(col("query_id"), col("doc_id"), col("score"))
  }
}
