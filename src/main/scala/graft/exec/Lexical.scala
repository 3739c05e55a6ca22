package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical subquery scoring for hybrid queries (the `match`/`term`/`range`
  * sub-kinds in the reference's hybrid fixtures). OpenSearch scores `match`
  * with Lucene BM25; we pin OUR deterministic scorer (documented divergence,
  * SURVEY §7.3): tf × idf with the BM25 idf form
  *     idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))
  * summed over query terms. Document frequencies come from a corpus-wide
  * aggregation restricted to the query terms — at scale a broadcast join of
  * a |terms|-row table, with the term filter pushed into the token explode.
  */
object Lexical {

  // The NATIVE-column form of HashEmbedder.tokenize (lower → split \s+ →
  // drop empties): one tokenizer semantics engine-wide, two physical forms
  // (codegen'd expression here for the hot exploded path, Scala function
  // where a UDF already owns the row). Equivalence is pinned by a property
  // test (Round3Spec "native tokenizer ≡ HashEmbedder.tokenize") — if
  // either side changes, that test fails before the oracles drift.
  private def toks(c: Column): Column = filter(split(lower(c), "\\s+"), x => x =!= "")

  /** (doc_id, score) for docs matching ≥1 term. */
  def matchScore(docs: DataFrame, terms: Seq[String], textCol: String = "text",
      docId: String = "doc_id", roundTo: Int = 6): DataFrame = {
    val termLit = typedLit(terms.distinct)
    val exploded = docs
      .select(col(docId).as("doc_id"), explode(toks(col(textCol))).as("token"))
      .where(array_contains(termLit, col("token")))
    val tf = exploded.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("N"))
    tf
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(n))
      .withColumn("idf", log(lit(1.0) + (col("N") - col("df") + 0.5) / (col("df") + 0.5)))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("tf") * col("idf")), roundTo).as("score"))
      .where(col("score") > 0.0)
  }

  /** `term` query: exact keyword equality — constant score 1.0 filter. */
  def termScore(docs: DataFrame, field: String, value: String,
      docId: String = "doc_id"): DataFrame =
    docs.where(col(field) === value).select(col(docId).as("doc_id"), lit(1.0).as("score"))

  /** `range` query: numeric/temporal bounds — constant score 1.0 filter. */
  def rangeScore(docs: DataFrame, field: String, gte: Option[Any], lt: Option[Any],
      docId: String = "doc_id"): DataFrame = {
    val base = (gte, lt) match {
      case (Some(a), Some(b)) => docs.where(col(field) >= a && col(field) < b)
      case (Some(a), None)    => docs.where(col(field) >= a)
      case (None, Some(b))    => docs.where(col(field) < b)
      case (None, None)       => docs
    }
    base.select(col(docId).as("doc_id"), lit(1.0).as("score"))
  }
}
