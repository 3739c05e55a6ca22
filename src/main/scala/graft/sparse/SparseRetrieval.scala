package graft.sparse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{PruneUtils, VectorExpressions}
import graft.model.HybridLimits

/** `neural_sparse` retrieval — exact path and the two-phase cascade
  * (reference: query/NeuralSparseQueryBuilder.java:569-589,
  * processor/NeuralSparseTwoPhaseProcessor.java:105-267).
  *
  * Two physical strategies for the same logical operator:
  *
  *  1. `scoreDocs` — per-row map dot product (SparseDot expression). One
  *     corpus scan, no shuffle until the final top-k. Right when the corpus
  *     table carries a `tokens` map column.
  *
  *  2. `scorePostings` — relational form over an exploded postings table
  *     `(token, doc_id, weight)`: broadcast-join the (tiny) query token set
  *     on `token`, then partial-agg sum per doc. This is the 100 TB shape:
  *     the postings table is partitioned/bucketed by token, the join prunes
  *     to only the query's tokens (partition pruning), and the groupBy is
  *     map-side-combined. It is also the substrate for SEISMIC (§2.6).
  */
object SparseRetrieval {

  /** Corpus (doc_id, tokens: Map) → exploded postings (token, doc_id, weight).
    * Written once at ingest, sorted/bucketed by token at scale. */
  def buildPostings(corpus: DataFrame, docId: String = "doc_id", tokens: String = "tokens"): DataFrame =
    corpus.select(col(docId).as("doc_id"), explode(col(tokens)).as(Seq("token", "weight")))

  /** Persist a postings INDEX partitioned by token-hash bucket — the
    * written form of the "postings table partitioned/bucketed by token"
    * posture above (and the sparse twin of [[graft.ann.Ann.writeIndex]]):
    * at read time a query batch's token set resolves to a bucket set on
    * the DRIVER, and the scan becomes Parquet PARTITION PRUNING — only the
    * touched buckets' directories are listed and read, never the full
    * postings relation. nBuckets sizes the pruning granularity: a batch
    * touching t distinct tokens reads ≤ min(t, nBuckets)/nBuckets of the
    * index. */
  def writePostingsIndex(postings: DataFrame, path: String,
      nBuckets: Int = 64): Unit =
    postings
      .withColumn("bucket", pmod(xxhash64(col("token")), lit(nBuckets.toLong)).cast("int"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  def loadPostingsIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(path)

  /** Driver-side bucket of one token — MUST match writePostingsIndex's
    * bucket expression (xxhash64 of the UTF-8 token, floor-mod): Spark's
    * pmod(xxhash64) over a string column and this kernel hash identically,
    * so the pruned read sees exactly the written buckets. */
  private[graft] def tokenBucket(token: String, nBuckets: Int): Int = {
    val bytes = token.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
    java.lang.Math.floorMod(h, nBuckets.toLong).toInt
  }

  /** [[batchTopK]] against a WRITTEN bucket-partitioned postings index:
    * same logical result, but the corpus-side scan prunes to the buckets
    * the batch's tokens hash into (PartitionFilters at the Parquet scan —
    * plan-pinned in PlansSpec). The query-batch side broadcasts as in
    * batchTopK. */
  def batchTopKPruned(index: DataFrame, queries: Map[Long, Map[String, Float]],
      k: Int, nBuckets: Int = 64, roundTo: Int = 6): DataFrame = {
    val buckets = queries.values.flatMap(_.keys).toSeq.distinct
      .map(tokenBucket(_, nBuckets)).distinct
    batchTopK(index.where(col("bucket").isin(buckets: _*)).drop("bucket"),
      queries, k, roundTo)
  }

  /** Strategy 1: expression dot product; keeps only matching docs (score>0). */
  def scoreDocs(corpus: DataFrame, qTokens: Map[String, Float],
      docId: String = "doc_id", tokens: String = "tokens",
      roundTo: Int = 6): DataFrame = {
    val sc = round(VectorExpressions.sparse_dot(col(tokens), typedLit(qTokens)), roundTo)
    corpus.select(col(docId).as("doc_id"), sc.as("score")).where(col("score") > 0.0)
  }

  /** Strategy 2: postings ⨝ broadcast(query tokens) → sum per doc. */
  def scorePostings(postings: DataFrame, qTokens: Map[String, Float],
      roundTo: Int = 6): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val q = qTokens.toSeq.toDF("token", "qw")
    postings
      .join(broadcast(q), "token")
      .groupBy(col("doc_id"))
      .agg(round(sum(col("weight").cast("double") * col("qw").cast("double")), roundTo).as("score"))
      .where(col("score") > 0.0)
  }

  /** Exact top-k: deterministic order (score desc, doc_id asc). */
  def topK(scored: DataFrame, k: Int): DataFrame =
    scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)

  /** Query-set-at-a-time batch retrieval (SURVEY.md §3.1 Spark equivalent):
    * a whole batch of sparse queries is scored in ONE pass over the
    * postings table. Queries arrive as a small DataFrame
    * (query_id, token, qw) — broadcast onto the postings join, so the
    * corpus-side scan cost is paid once for the batch, not per query.
    * Per-query top-k = rank window partitioned by query_id.
    */
  def batchTopK(postings: DataFrame, queries: Map[Long, Map[String, Float]], k: Int,
      roundTo: Int = 6): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val qDf = queries.toSeq
      .flatMap { case (qid, m) => m.toSeq.map { case (tk, w) => (qid, tk, w) } }
      .toDF("query_id", "token", "qw")
    val scored = postings
      .join(broadcast(qDf), "token")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("weight").cast("double") * col("qw").cast("double")), roundTo).as("score"))
      .where(col("score") > 0.0)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  def exactTopK(corpus: DataFrame, qTokens: Map[String, Float], k: Int = HybridLimits.DefaultK,
      docId: String = "doc_id", tokens: String = "tokens"): DataFrame =
    topK(scoreDocs(corpus, qTokens, docId, tokens), k)

  /** approximate_threshold strategy (sparse/common/SparseConstants.java:35,
    * codec gate SparseCodecService): exact scan below the threshold, SEISMIC
    * above — the reference's per-segment cost-based physical choice becomes
    * a per-table strategy pick here. The logical result contract is the
    * same top-k; below threshold it is exact.
    *
    * The SEISMIC index and the corpus row count are INGEST-time artifacts
    * (the reference builds on merge/flush and reads segment doc counts);
    * pass them in (`index`, `docCount`) so repeated queries do not pay a
    * clustering job and a count scan each — when omitted they are computed
    * once here, which is only appropriate for one-shot use. */
  def autoTopK(corpus: DataFrame, qTokens: Map[String, Float], k: Int = HybridLimits.DefaultK,
      approximateThreshold: Long = graft.seismic.Seismic.DefaultApproximateThreshold.toLong,
      docId: String = "doc_id", tokens: String = "tokens",
      index: Option[graft.seismic.Seismic.SeismicIndex] = None,
      docCount: Option[Long] = None): DataFrame = {
    val n = docCount.getOrElse(corpus.count())
    if (n < approximateThreshold) exactTopK(corpus, qTokens, k, docId, tokens)
    else {
      val idx = index.getOrElse(
        graft.seismic.Seismic.build(corpus, docId = docId, tokens = tokens))
      graft.seismic.Seismic.search(idx, corpus, qTokens, k = k, docId = docId, tokens = tokens)
    }
  }

  /** Two-phase cascade (NeuralSparseTwoPhaseProcessor defaults: prune_ratio
    * 0.4 / max_ratio split, window = size × 5.0 capped at 10000):
    * phase 1 ranks by the HIGH-weight query tokens only and keeps a candidate
    * window; phase 2 rescores ONLY the window with the full token set.
    * Same logical result as exact when the window covers all matches —
    * a pure physical optimization, exactly like the reference's rescorer.
    */
  def twoPhaseTopK(
      corpus: DataFrame,
      qTokens: Map[String, Float],
      k: Int = HybridLimits.DefaultK,
      pruneRatio: Float = 0.4f,
      expansion: Float = 5.0f,
      maxWindowSize: Int = 10000,
      docId: String = "doc_id",
      tokens: String = "tokens",
      pruneType: PruneUtils.PruneType = PruneUtils.MaxRatio): DataFrame = {
    val (hi, lo) = PruneUtils.split(qTokens, pruneType, pruneRatio)
    if (lo.isEmpty) return exactTopK(corpus, qTokens, k, docId, tokens)
    val window = math.min(math.max((k * expansion).toInt, k), maxWindowSize)
    val phase1 = topK(scoreDocs(corpus, hi, docId, tokens), window)
      .select(col("doc_id"))
    // Phase 2: rescore candidates with the FULL token map. The candidate set
    // is ≤ window rows — broadcast it back onto the corpus scan.
    val rescored = corpus
      .join(broadcast(phase1), corpus(docId) === phase1("doc_id"))
      .select(corpus(docId).as("doc_id"),
        round(VectorExpressions.sparse_dot(corpus(tokens), typedLit(qTokens)), 6).as("score"))
      .where(col("score") > 0.0)
    topK(rescored, k)
  }
}
