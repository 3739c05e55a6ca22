package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model._

/** The hybrid query dataflow — Spark re-expression of the reference's
  * query-phase + normalization-processor pipeline (SURVEY.md §3.1):
  *
  *   corpus --[subquery score exprs]--> [query_id, subq, doc_id, score]
  *     --per-subquery topK (pagination_depth)--> candidates
  *     --normalize (per query_id,subq)--> --combine (per query_id,doc_id)-->
  *     --min_score?--> --collapse?--> --sort + from/size--> results
  *
  * Where the reference runs subqueries as parallel Lucene scorers with
  * per-shard K-heaps (HybridCollectorManager.java:114-257,
  * HybridTopScoreDocCollector.java:135-173) and merges delimiter-encoded
  * arrays at the coordinator, here each subquery is a score column computed
  * in ONE pass over the corpus, the per-subquery K-cut is a rank window, and
  * the shuffle replaces the coordinator merge. At 100 TB the only wide
  * exchanges are (a) the rank window partitioned by (query_id, subq) and
  * (b) the combine groupBy (query_id, doc_id) — both keyed on query batch
  * dimensions, never on the raw corpus.
  */
object HybridPipeline {

  /** Score a corpus against a batch of subquery scoring expressions.
    * `subqueryScores(i)` evaluates to the doc's score under subquery i, or
    * null when the doc does not match that subquery (the reference's
    * "no-hit in this scorer" case). Produces the canonical intermediate
    * relation [query_id, subq, doc_id, score].
    *
    * The per-subquery score columns are computed in a single projection, then
    * unpivoted via an inline explode — one corpus scan total, no union of N
    * scans. Filters (`filter` param of the hybrid query,
    * HybridQueryBuilder.java:117-128) should be applied on `corpus` BEFORE
    * calling — Catalyst pushes them into the parquet scan.
    */
  def score(
      corpus: DataFrame,
      docId: Column,
      subqueryScores: Seq[Column],
      queryId: Long = 0L): DataFrame = {
    require(subqueryScores.nonEmpty, "at least one subquery required")
    val pairs = subqueryScores.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("subq"), c.cast("double").as("score"))
    }
    corpus
      .select(docId.as("doc_id"), explode(array(pairs: _*)).as("e"))
      .select(
        lit(queryId).as("query_id"),
        col("e.subq").as("subq"),
        col("doc_id"),
        col("e.score").as("score"))
      .where(col("score").isNotNull)
  }

  /** Per-subquery top-K cut — the pagination_depth / K-heap semantics
    * (HybridCollectorManager.java:235-257). Deterministic tie-break
    * (score desc, doc_id asc). */
  def perSubqueryTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"), col("subq"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored
      .withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k)
      .drop("__rank")
  }

  /** Full pipeline from the scored intermediate relation to final ranked
    * results [query_id, doc_id, score, rank].
    *
    * @param paginationDepth per-subquery candidate depth K (default from+size,
    *                        HybridQueryBuilder.java:385-406)
    * @param minScore        post-combination score floor (ScoreCombiner.java:73-160)
    * @param collapse        optional (collapseKeyPerDoc, docsPerGroup): keep top
    *                        rows per (query, collapse key) — CollapseExecutor.java
    * @param from,size       pagination; from > #results is an error in the
    *                        reference ("increase pagination_depth")
    */
  def run(
      scored: DataFrame,
      numSubqueries: Int,
      norm: NormalizationSpec,
      comb: CombinationSpec,
      paginationDepth: Option[Int] = None,
      from: Int = 0,
      size: Int = HybridLimits.DefaultK,
      minScore: Option[Double] = None,
      collapse: Option[(DataFrame, Int)] = None): DataFrame = {
    HybridValidation.validate(numSubqueries, norm, comb, paginationDepth)
    val k = paginationDepth.getOrElse(from + size)
    val candidates = perSubqueryTopK(scored, k)
    val normalized = Normalization.normalize(candidates, norm)
    val combined = Combination.combine(normalized, comb)
    val floored = minScore match {
      case Some(ms) => combined.where(col("score") >= ms)
      case None     => combined
    }
    val collapsed = collapse match {
      case Some((keys, docsPerGroup)) =>
        // keys: DataFrame[doc_id, collapse_key]; one (top) row per key
        val w = Window.partitionBy(col("query_id"), col("collapse_key"))
          .orderBy(col("score").desc, col("doc_id").asc)
        floored
          .join(broadcastIfSmall(keys), Seq("doc_id"), "left")
          .withColumn("__gr", row_number().over(w))
          .where(col("__gr") <= docsPerGroup)
          .drop("__gr", "collapse_key")
      case None => floored
    }
    val wFinal = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    collapsed
      .withColumn("rank", row_number().over(wFinal))
      .where(col("rank") > from && col("rank") <= from + size)
  }

  private def broadcastIfSmall(df: DataFrame): DataFrame = df

  /** Field-sorted hybrid (HybridTopFieldDocSortCollector, SURVEY §2.5):
    * when the request carries a `sort`, BOTH the per-subquery K-cut and the
    * final ordering use the sort key instead of the score (the reference's
    * field collectors collect by sort during the query phase). Scores are
    * still normalized/combined and reported (trackScores=true form).
    *
    * @param sortKeys DataFrame[doc_id, sort_key]; ties break by doc_id asc
    * @param ascending sort direction for sort_key
    */
  def runSorted(
      scored: DataFrame,
      numSubqueries: Int,
      norm: NormalizationSpec,
      comb: CombinationSpec,
      sortKeys: DataFrame,
      ascending: Boolean = false,
      paginationDepth: Option[Int] = None,
      from: Int = 0,
      size: Int = HybridLimits.DefaultK): DataFrame = {
    HybridValidation.validate(numSubqueries, norm, comb, paginationDepth)
    val k = paginationDepth.getOrElse(from + size)
    // LEFT join + nulls-last: a matching doc with no sort key still appears
    // (sorted after all keyed docs), mirroring the reference field
    // collector's missing-value policy — an inner join would silently drop
    // top-scoring docs whenever the sort-key table has gaps
    val keyOrder =
      if (ascending) col("sort_key").asc_nulls_last else col("sort_key").desc_nulls_last
    val keyed = scored.join(broadcastIfSmall(sortKeys), Seq("doc_id"), "left")
    val wCut = Window.partitionBy(col("query_id"), col("subq"))
      .orderBy(keyOrder, col("doc_id").asc)
    val candidates = keyed
      .withColumn("__rank", row_number().over(wCut))
      .where(col("__rank") <= k)
      .drop("__rank")
    val normalized = Normalization.normalize(
      candidates.select(col("query_id"), col("subq"), col("doc_id"), col("score")), norm)
    val combined = Combination.combine(normalized, comb)
    val wFinal = Window.partitionBy(col("query_id"))
      .orderBy(keyOrder, col("doc_id").asc)
    combined
      .join(broadcastIfSmall(sortKeys), Seq("doc_id"), "left")
      .withColumn("rank", row_number().over(wFinal))
      .where(col("rank") > from && col("rank") <= from + size)
      .drop("sort_key")
  }

  /** search_after keyset pagination (HybridTopFieldDocSortCollector /
    * PagingFieldCollector, SURVEY §2.5): resume below the last-seen
    * (score, doc_id) cursor instead of a numeric offset — O(k) per page at
    * any depth, the scale-correct pagination. */
  def searchAfter(results: DataFrame, afterScore: Double, afterDocId: Long,
      size: Int = HybridLimits.DefaultK): DataFrame =
    results
      .where(col("score") < afterScore ||
        (col("score") === afterScore && col("doc_id") > afterDocId))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(size)

  /** Convenience: single-query hybrid end-to-end over a corpus. */
  def hybrid(
      corpus: DataFrame,
      docId: Column,
      subqueryScores: Seq[Column],
      norm: NormalizationSpec,
      comb: CombinationSpec,
      k: Int = HybridLimits.DefaultK,
      paginationDepth: Option[Int] = None): DataFrame = {
    val scored = score(corpus, docId, subqueryScores)
    run(scored, subqueryScores.size, norm, comb,
      paginationDepth = paginationDepth.orElse(Some(math.max(k, HybridLimits.DefaultK))),
      from = 0, size = k)
  }
}
