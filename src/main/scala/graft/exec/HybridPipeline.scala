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
  /** Query-SET-at-a-time hybrid scoring over a sparse postings index: the
    * per-query [[score]] form pays one corpus scan per query (a 2-query
    * batch unions 2 scans — fine; a 1000-query serving batch must not run
    * 1000 scans). Here the ENTIRE (query, subquery) token batch joins the
    * postings relation ONCE — broadcast query side, corpus-side cost paid
    * once for the batch — and emits the same canonical intermediate
    * relation [query_id, subq, doc_id, score] that [[run]] consumes
    * (positive scores only, the "no-hit in this scorer" rows absent,
    * round-6 like the single-query sparse kernel).
    *
    * CHUNKED above `chunkSize` queries: the single join's intermediate
    * grows with Σ_t df_query(t)·df_doc(t), so a corpus-hot token shared by
    * most of a 10k-query batch multiplies its whole posting list by the
    * batch size inside ONE aggregation (measured: the qset sweep's
    * per-query cost fell monotonically to batch 1 000 then saturated at
    * 10 000). Batches larger than `chunkSize` are split on query_id and
    * each chunk joins the postings independently (union of per-chunk
    * results — exact: queries never interact across chunks), bounding the
    * hot-token fan-out per join at chunkSize·df while still paying the
    * corpus side only |batch|/chunkSize times. Callers serving large
    * batches should hand in a PERSISTED (or written, partition-prunable)
    * postings relation so per-chunk scans hit cache/pruned files — both
    * bench memos already do. */
  /** Sweep-fit auto chunk: clamp(|batch| / 5, 500, 4000). The r12 qset
    * sweep proved no CONSTANT wins both scales (c500 best at 1k queries —
    * 8.1 vs 14.9 s; c2000 best at 10k — 82.9 vs 106.7 s; SCALE.md qset
    * table), because smaller chunks bound the per-join hot-token fan-out
    * while fewer chunks amortize the corpus side. batch/5 passes through
    * BOTH measured winners exactly, and any chunking is exact (chunks
    * never interact — spec-pinned chunked ≡ single-join). */
  def autoChunkSize(nQueries: Int): Int =
    math.min(4000, math.max(500, nQueries / 5))

  def scoreBatchSparse(postings: DataFrame,
      queries: Map[Long, Seq[Map[String, Float]]],
      roundTo: Int = 6, chunkSize: Int = 0): DataFrame = {
    require(chunkSize >= 0, "chunkSize must be positive (0 = auto)")
    require(queries.nonEmpty && queries.values.forall(_.nonEmpty),
      "at least one query with at least one subquery required")
    val cs = if (chunkSize == 0) autoChunkSize(queries.size) else chunkSize
    if (queries.size > cs)
      return queries.toSeq.sortBy(_._1).grouped(cs)
        .map(ch => scoreBatchSparse(postings, ch.toMap, roundTo, cs))
        .reduce(_.unionByName(_))
    val spark = postings.sparkSession
    import spark.implicits._
    val qDf = queries.toSeq
      .flatMap { case (qid, subs) =>
        subs.zipWithIndex.flatMap { case (m, i) =>
          m.toSeq.map { case (tk, w) => (qid, i, tk, w) }
        }
      }
      .toDF("query_id", "subq", "token", "qw")
    postings
      .join(broadcast(qDf), "token")
      .groupBy(col("query_id"), col("subq"), col("doc_id"))
      .agg(round(sum(col("weight").cast("double") * col("qw").cast("double")),
        roundTo).as("score"))
      .where(col("score") > 0.0)
  }

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
    * @param postFilter      optional doc-id set applied AFTER normalization and
    *                        combination (the search-request post_filter,
    *                        HybridQueryPostFilterIT): unlike the hybrid `filter`
    *                        param (pushed below scoring), it does NOT change the
    *                        per-subquery candidate sets or the normalization
    *                        statistics — faceted-search semantics. Ranks and
    *                        pagination apply to the filtered hit list.
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
      collapse: Option[(DataFrame, Int)] = None,
      postFilter: Option[DataFrame] = None): DataFrame = {
    HybridValidation.validate(numSubqueries, norm, comb, paginationDepth)
    val k = paginationDepth.getOrElse(from + size)
    val candidates = perSubqueryTopK(scored, k)
    val normalized = Normalization.normalize(candidates, norm)
    val combined = Combination.combine(normalized, comb)
    val postFiltered = postFilter match {
      // the allowed-id set is a filter on a (small) combined result — a
      // broadcastable left-semi join, never a shuffle of the corpus
      case Some(ids) => combined.join(ids.select(col("doc_id")), Seq("doc_id"), "left_semi")
      case None      => combined
    }
    val floored = minScore match {
      case Some(ms) => postFiltered.where(col("score") >= ms)
      case None     => postFiltered
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

  /** Collapse-key / sort-key relations join against the (small, ≤ pagination
    * depth × queries) combined result — broadcasting the key side avoids
    * shuffling it when it is itself small, but a corpus-sized key relation
    * (every doc has a collapse key) must NOT be pinned to the driver. Gate
    * on Catalyst's plan-stats estimate (plan-time only — no job) at the
    * default autoBroadcastJoinThreshold scale; oversized relations fall back
    * to the planner's choice (AQE can still decide from runtime stats). */
  private val BroadcastKeyBytes = 32L << 20
  private def broadcastIfSmall(df: DataFrame): DataFrame =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= BroadcastKeyBytes) broadcast(df)
    else df

  /** Per-subquery collapse during collection — the semantics of the
    * reference's HybridCollapsingTopDocsCollector.java:54-423: each
    * SUBQUERY's candidate list is collapsed to the top `docsPerGroup` docs
    * per collapse key BEFORE normalization (deprecated docs-per-group
    * setting default 2, NeuralSearchSettings.java:79-87). Post-combination
    * collapse (run's `collapse` param) is the final-hits form; this one
    * changes which candidates each subquery contributes, and therefore the
    * normalization statistics. Apply to the scored relation before `run`.
    *
    * @param keys DataFrame[doc_id, collapse_key]
    */
  def perSubqueryCollapse(scored: DataFrame, keys: DataFrame, docsPerGroup: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"), col("subq"), col("collapse_key"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored
      .join(broadcastIfSmall(keys), Seq("doc_id"), "left")
      .withColumn("__gr", row_number().over(w))
      .where(col("__gr") <= docsPerGroup)
      .select(col("query_id"), col("subq"), col("doc_id"), col("score"))
  }

  /** Collapse with inner hits (HybridQueryInnerHitsIT; the bool(must=hybrid,
    * filter) unwrap of HybridQueryPhaseSearcher.java:58-193 exists so
    * collapse inner-hit subrequests can re-enter the hybrid query): the
    * final hit list keeps ONE representative per collapse key (the group
    * top), ranked and paginated as usual, and each representative row is
    * accompanied by the group's top `innerSize` member rows. Emitted
    * FLATTENED — one row per (representative, inner hit) with columns
    * [query_id, collapse_key, doc_id, score, rank, inner_rank, inner_doc_id,
    * inner_score] — which is the relational (and cross-engine-hashable)
    * encoding of the nested inner_hits response section.
    */
  def runCollapseInnerHits(
      scored: DataFrame,
      numSubqueries: Int,
      norm: NormalizationSpec,
      comb: CombinationSpec,
      keys: DataFrame,
      innerSize: Int,
      paginationDepth: Option[Int] = None,
      from: Int = 0,
      size: Int = HybridLimits.DefaultK,
      minScore: Option[Double] = None): DataFrame = {
    HybridValidation.validate(numSubqueries, norm, comb, paginationDepth)
    val k = paginationDepth.getOrElse(from + size)
    val candidates = perSubqueryTopK(scored, k)
    val normalized = Normalization.normalize(candidates, norm)
    val combined = Combination.combine(normalized, comb)
    val floored = minScore match {
      case Some(ms) => combined.where(col("score") >= ms)
      case None     => combined
    }
    // one window pass ranks every doc within its collapse group; the
    // group-rank-1 rows are the representatives, ranks ≤ innerSize are the
    // group's inner hits — no second aggregation over the corpus
    val wGroup = Window.partitionBy(col("query_id"), col("collapse_key"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val grouped = floored
      .join(broadcastIfSmall(keys), Seq("doc_id"), "left")
      .withColumn("__gr", row_number().over(wGroup))
    val wFinal = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val reps = grouped
      .where(col("__gr") === 1)
      .withColumn("rank", row_number().over(wFinal))
      .where(col("rank") > from && col("rank") <= from + size)
      .select(col("query_id"), col("collapse_key"),
        col("doc_id"), col("score"), col("rank"))
    val inner = grouped
      .where(col("__gr") <= innerSize)
      .select(col("query_id").as("__iq"), col("collapse_key").as("__ik"),
        col("__gr").as("inner_rank"),
        col("doc_id").as("inner_doc_id"), col("score").as("inner_score"))
    // null-safe key equality: docs absent from `keys` share the null
    // collapse group (matching run()'s collapse path); a plain equi-join
    // would silently drop that group's representative AND leave a hole in
    // the rank sequence
    reps.join(inner,
        reps("query_id") === inner("__iq") &&
          reps("collapse_key") <=> inner("__ik"))
      .drop("__iq", "__ik")
  }

  /** One sort dimension of a field-sorted hybrid request: `field` names a
    * column of the caller's sort-key relation (SortField array in the
    * reference's HybridTopFieldDocSortCollector). */
  case class SortField(field: String, ascending: Boolean)

  /** Sort order for a field spec: per-field direction, nulls LAST in both
    * directions (reference missing-value policy), doc_id asc tie-break. */
  private def fieldOrder(fields: Seq[SortField]): Seq[Column] =
    fields.map(f =>
      if (f.ascending) col(f.field).asc_nulls_last
      else col(f.field).desc_nulls_last) :+ col("doc_id").asc

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
      size: Int = HybridLimits.DefaultK): DataFrame =
    runSortedFields(scored, numSubqueries, norm, comb, sortKeys,
      Seq(SortField("sort_key", ascending)), paginationDepth, from, size)

  /** Multi-field-sorted hybrid — the general SortField[] form of the
    * reference collector (HybridTopFieldDocSortCollector.java takes the
    * request's full sort array; the single-key [[runSorted]] is the
    * one-element case). K-cut and final rank order lexicographically by
    * `fields` (each with its own direction), ties by doc_id asc.
    *
    * @param sortKeys DataFrame[doc_id, f1, f2, …] carrying every column
    *                 named in `fields`
    */
  def runSortedFields(
      scored: DataFrame,
      numSubqueries: Int,
      norm: NormalizationSpec,
      comb: CombinationSpec,
      sortKeys: DataFrame,
      fields: Seq[SortField],
      paginationDepth: Option[Int] = None,
      from: Int = 0,
      size: Int = HybridLimits.DefaultK): DataFrame = {
    require(fields.nonEmpty, "at least one sort field required")
    HybridValidation.validate(numSubqueries, norm, comb, paginationDepth)
    val k = paginationDepth.getOrElse(from + size)
    val ord = fieldOrder(fields)
    // LEFT join + nulls-last: a matching doc with no sort key still appears
    // (sorted after all keyed docs), mirroring the reference field
    // collector's missing-value policy — an inner join would silently drop
    // top-scoring docs whenever the sort-key table has gaps
    val keyed = scored.join(broadcastIfSmall(sortKeys), Seq("doc_id"), "left")
    val wCut = Window.partitionBy(col("query_id"), col("subq")).orderBy(ord: _*)
    val candidates = keyed
      .withColumn("__rank", row_number().over(wCut))
      .where(col("__rank") <= k)
      .drop("__rank")
    val normalized = Normalization.normalize(
      candidates.select(col("query_id"), col("subq"), col("doc_id"), col("score")), norm)
    val combined = Combination.combine(normalized, comb)
    val wFinal = Window.partitionBy(col("query_id")).orderBy(ord: _*)
    combined
      .join(broadcastIfSmall(sortKeys), Seq("doc_id"), "left")
      .withColumn("rank", row_number().over(wFinal))
      .where(col("rank") > from && col("rank") <= from + size)
      .drop(fields.map(_.field): _*)
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

  /** search_after over a FIELD sort (PagingFieldCollector.java:1-101 — the
    * FieldDoc cursor form): `after(i)` is the cursor value for `fields(i)`
    * (null = the cursor row's key was null), `afterDocId` the cursor row's
    * doc_id tie-break. Emits the next `size` rows strictly after the cursor
    * in the lexicographic (fields…, doc_id) order — O(k) per page at any
    * depth. `results` must carry the sort-field columns and doc_id.
    *
    * Null handling mirrors the nulls-LAST ordering: a non-null cursor
    * admits nulls (they sort after everything); a null cursor admits only
    * the null tail, where deeper keys break the tie. */
  def searchAfterFields(results: DataFrame, fields: Seq[SortField],
      after: Seq[Any], afterDocId: Long,
      size: Int = HybridLimits.DefaultK): DataFrame = {
    require(fields.nonEmpty, "at least one sort field required")
    require(after.length == fields.length,
      s"cursor arity ${after.length} != sort arity ${fields.length}")
    def strictlyAfter(f: SortField, a: Any): Column =
      if (a == null) lit(false) // within the null tail only ties advance
      else {
        val c = col(f.field)
        (if (f.ascending) c > lit(a) else c < lit(a)) || c.isNull
      }
    def equalTo(f: SortField, a: Any): Column =
      if (a == null) col(f.field).isNull else col(f.field) === lit(a)
    val levels = fields.indices.map { i =>
      (0 until i).map(j => equalTo(fields(j), after(j)))
        .foldLeft(strictlyAfter(fields(i), after(i)))(_ && _)
    }
    val allEqual = fields.indices.map(j => equalTo(fields(j), after(j)))
      .foldLeft(col("doc_id") > afterDocId)(_ && _)
    results
      .where((levels :+ allEqual).reduce(_ || _))
      .orderBy(fieldOrder(fields): _*)
      .limit(size)
  }

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
