package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.exec.HybridPipeline
import graft.exec.HybridPipeline.SortField
import graft.functions.VectorExpressions
import graft.model.{CombinationSpec, NormalizationSpec}

/** Eighth bank (round 6): multi-field sort and field-cursor search_after
  * (HybridTopFieldDocSortCollector / PagingFieldCollector full forms),
  * Lucene-parity BM25 lexical scoring. */
object Queries8 {

  import SparkEntry.{docsWithTokens, qTokensA, qTokensB}

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def sparseSub(q: Map[String, Float]): Column = {
    val sc = round(VectorExpressions.sparse_dot(col("tokens"), typedLit(q)), 6)
    when(sc > 0.0, sc)
  }

  /** The two-subquery sparse hybrid over (lang asc, n_chars desc) sort —
    * shared by the multi-sort query and the field-cursor pagination query. */
  private def sortedMultiBase(s: SparkSession, dir: String, size: Int): DataFrame = {
    val scored = HybridPipeline.score(docsWithTokens(s, dir), col("doc_id"),
      Seq(sparseSub(qTokensA), sparseSub(qTokensB)))
    val sortKeys = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    HybridPipeline.runSortedFields(scored, 2, NormalizationSpec.MinMax(),
      CombinationSpec.ArithmeticMean(), sortKeys,
      Seq(SortField("lang", ascending = true), SortField("n_chars", ascending = false)),
      paginationDepth = Some(100), size = size)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // multi-field-sorted hybrid: K-cut AND final rank by (lang asc,
    // n_chars desc, doc_id asc) — the SortField[] form of the reference
    // collector; q_hybrid_sorted is the one-key special case
    "q_hybrid_sorted_multi" -> ((s, dir) =>
      sortedMultiBase(s, dir, size = 10)
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))),

    // search_after with a FIELD-sort cursor (PagingFieldCollector): the
    // cursor is the page-1 row at rank 5 (lang, n_chars, doc_id) as a
    // client would resend it; the page is the next 10 rows strictly after
    // it in (lang asc, n_chars desc, doc_id asc) order
    "q_search_after_fields" -> ((s, dir) => {
      val keys = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val base = sortedMultiBase(s, dir, size = 100)
        .join(keys, Seq("doc_id"))
      val cur = base.where(col("rank") === 5)
        .select(col("lang"), col("n_chars"), col("doc_id")).head()
      HybridPipeline.searchAfterFields(
        base.drop("rank"),
        Seq(SortField("lang", ascending = true), SortField("n_chars", ascending = false)),
        Seq(cur.getString(0), cur.getLong(1)), cur.getLong(2), size = 10)
        .select(col("doc_id"), round(col("score"), 4).as("score"))
    }),

    // Lucene-parity BM25 match (BM25Similarity formula over standard-
    // analyzer tokens, exact doc lengths) — closes the biggest documented
    // lexical divergence: the whitespace tf×idf scorer vs what a real
    // cluster computes
    "q_lexical_bm25" -> ((s, dir) =>
      graft.exec.Lexical.bm25Score(t(s, dir, "documents"), bm25Terms)
        .orderBy(col("doc_id"))),

    // verbatim reference JSON with `sort`: the body's sort array routes the
    // whole request through the field collector (runSortedFields) — same
    // semantics as q_hybrid_sorted_multi but entered via the DSL
    "q_dsl_sorted" -> ((s, dir) => {
      import graft.exec.QueryCompiler
      import graft.model.QueryDsl
      val body =
        """{"query": {"hybrid": {"pagination_depth": 100, "queries": [
          |  {"neural_sparse": {"text": {"query_text": "spark join fast table scan"}}},
          |  {"neural_sparse": {"text": {"query_text": "stream window agg merge sort batch"}}}]}},
          | "size": 10,
          | "sort": [{"lang": "asc"}, {"n_chars": {"order": "desc"}}]}""".stripMargin
      val pipeline =
        """{"phase_results_processors": [{"normalization-processor": {
          |  "normalization": {"technique": "min_max"},
          |  "combination": {"technique": "arithmetic_mean"}}}]}""".stripMargin
      val req0 = QueryDsl.parse(body, Some(pipeline))
      val req = req0.copy(subqueries = req0.subqueries.map(_.copy(tokensCol = Some("tokens"))))
      QueryCompiler.run(docsWithTokens(s, dir), req)
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
    }),

    // verbatim reference JSON with `search_after` under a field sort: the
    // body carries the (lang, n_chars, doc_id) cursor a client would resend
    // (PagingFieldCollector); constants chosen corpus-independent
    "q_dsl_search_after" -> ((s, dir) => {
      import graft.exec.QueryCompiler
      import graft.model.QueryDsl
      val body =
        """{"query": {"hybrid": {"pagination_depth": 100, "queries": [
          |  {"neural_sparse": {"text": {"query_text": "spark join fast table scan"}}},
          |  {"neural_sparse": {"text": {"query_text": "stream window agg merge sort batch"}}}]}},
          | "size": 10,
          | "sort": [{"lang": "asc"}, {"n_chars": {"order": "desc"}}],
          | "search_after": ["en", 300, 50]}""".stripMargin
      val pipeline =
        """{"phase_results_processors": [{"normalization-processor": {
          |  "normalization": {"technique": "min_max"},
          |  "combination": {"technique": "arithmetic_mean"}}}]}""".stripMargin
      val req0 = QueryDsl.parse(body, Some(pipeline))
      val req = req0.copy(subqueries = req0.subqueries.map(_.copy(tokensCol = Some("tokens"))))
      QueryCompiler.run(docsWithTokens(s, dir), req)
        .select(col("doc_id"), round(col("score"), 4).as("score"))
    }),

    // incremental IVF: 90% of the vectors are the cell-partitioned BASE,
    // 10% arrive as an appended delta batch; search = probed cells over
    // base + exact over delta, merged — the dense twin of
    // q_seismic_incremental (same versioned layout, same oracle shape)
    "q_ann_ivf_incremental" -> ((s, dir) => {
      import graft.ann.Ann
      import graft.streaming.IndexMaintenance
      val centroids = Ann.seededCentroids(nlist = 8, dim = 64)
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      // fingerprint covers the DELTA LAYOUT version too (per-batch dirs +
      // watermark since round 7): an old-layout root must not be reused
      val root = s"/tmp/graft_incr_ivf/${dir.replace('/', '_')}_n8_mod10_d1"
      if (!new java.io.File(root, "_DONE").exists()) {
        IndexMaintenance.initializeIvf(emb.where(col("vec_id") % 10 =!= 0), root, centroids)
        IndexMaintenance.appendBatch(emb.where(col("vec_id") % 10 === 0), root)
        new java.io.File(root, "_DONE").createNewFile()
      }
      val v = IndexMaintenance.currentVersion(root)
      val (assigned, cents) = Ann.loadIndex(s, IndexMaintenance.ivfDir(root, v))
      val baseC = s.read.parquet(IndexMaintenance.baseDir(root, v))
      val deltaC = IndexMaintenance.readDelta(s, root, baseC)
      IndexMaintenance.searchSegmentedIvf(assigned, cents, deltaC,
        SparkEntry.qDense64, k = 10, nprobe = 4)
    }),

    // incremental index maintenance end-to-end (segment flush/merge
    // analogue): 90% of the corpus is the clustered BASE (initialize), the
    // other 10% arrives as an appended DELTA batch; search = pruned SEISMIC
    // over base + exact over delta, merged — the oracle replicates both
    // sides (seismicSql with base/delta predicates)
    "q_seismic_incremental" -> ((s, dir) => {
      import graft.streaming.IndexMaintenance
      val docs = SparkEntry.docsWithTokens(s, dir).select(col("doc_id"), col("tokens"))
      // staging fingerprint covers the build constants — changed constants
      // land in a fresh root instead of serving a stale index
      // _d1 = delta-layout version (per-batch dirs + watermark, round 7)
      val fp = s"np${SparkEntry.SeismicTruncNPostings}_mod10_d1"
      val root = s"/tmp/graft_incr_index/${dir.replace('/', '_')}_$fp"
      if (!new java.io.File(root, "_DONE").exists()) {
        IndexMaintenance.initialize(docs.where(col("doc_id") % 10 =!= 0), root,
          nPostings = SparkEntry.SeismicTruncNPostings)
        IndexMaintenance.appendBatch(docs.where(col("doc_id") % 10 === 0), root)
        new java.io.File(root, "_DONE").createNewFile()
      }
      val v = IndexMaintenance.currentVersion(root)
      val idx = graft.seismic.Seismic.load(s, IndexMaintenance.indexDir(root, v))
      val baseC = s.read.parquet(IndexMaintenance.baseDir(root, v))
      val deltaC = IndexMaintenance.readDelta(s, root, baseC)
      IndexMaintenance.searchSegmented(idx, baseC, deltaC, qTokensA,
        k = 10, topN = 3, heapFactor = 2.0f)
    })
  )

  private val bm25Terms = Seq("spark", "join", "fast", "table", "scan")

  // ------------------------------------------------------------- oracle SQL

  /** The sorted-multi combination chain: per-subquery K-cut by the field
    * sort, min_max, arithmetic mean, final rank by the field sort. */
  private def sortedMultiChain: String = {
    def kCut(name: String, values: String) =
      s"""s_$name AS (${OracleGen.sparseScoreSql(values)}),
         |k_$name AS (
         |  SELECT doc_id, score FROM (
         |    SELECT s.doc_id, s.score,
         |           row_number() OVER (ORDER BY d.lang ASC, d.n_chars DESC, s.doc_id ASC) AS rn
         |    FROM s_$name s JOIN documents d USING (doc_id)) WHERE rn <= 100
         |)""".stripMargin
    def minMax(i: Int, name: String) =
      s"""n$i AS (
         |  SELECT doc_id,
         |         CASE WHEN CAST(mx AS REAL) = CAST(mn AS REAL)
         |                   AND CAST(mx AS REAL) = CAST(score AS REAL) THEN 1.0
         |              WHEN CAST(score AS REAL) = CAST(mn AS REAL) THEN 0.001
         |              ELSE (score - mn) / (mx - mn) END AS nscore
         |  FROM (SELECT doc_id, score, min(score) OVER () AS mn, max(score) OVER () AS mx
         |        FROM k_$name)
         |)""".stripMargin
    s"""WITH ${OracleGen.docVectorsCte},
       |${kCut("a", OracleGen.valuesOf(qTokensA))},
       |${kCut("b", OracleGen.valuesOf(qTokensB))},
       |${minMax(0, "a")}, ${minMax(1, "b")},
       |comb AS (
       |  SELECT doc_id, sum(nscore) / count(*) AS score
       |  FROM (SELECT * FROM n0 UNION ALL SELECT * FROM n1) GROUP BY doc_id
       |), ranked AS (
       |  SELECT c.doc_id, c.score, d.lang, d.n_chars,
       |         CAST(row_number() OVER (ORDER BY d.lang ASC, d.n_chars DESC, c.doc_id ASC) AS INT) AS rank
       |  FROM comb c JOIN documents d USING (doc_id)
       |)""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q_hybrid_sorted_multi" ->
      s"""$sortedMultiChain
         |SELECT doc_id, round(score, 4) AS score, rank
         |FROM ranked WHERE rank <= 10 ORDER BY rank""".stripMargin,

    // base: seeded-centroid assignment + probed cells restricted to the
    // 90%; delta: exact cosine over the 10%; merged top-k
    "q_ann_ivf_incremental" -> {
      import graft.ann.Ann
      val centroids = Ann.seededCentroids(nlist = 8, dim = 64)
      val probed = Ann.probedCells(centroids, SparkEntry.qDense64, nprobe = 4)
      val centRows = centroids.zipWithIndex
        .map { case (c, i) => s"($i, ${OracleGen.doubleList(c)})" }
        .mkString(",\n")
      val cosAssign = OracleGen.denseCosineSql("CAST(e.embedding AS DOUBLE[])", "c.c")
      val cosScore = OracleGen.denseCosineSql("CAST(e.embedding AS DOUBLE[])",
        OracleGen.doubleList(SparkEntry.qDense64))
      s"""WITH cents(i, c) AS (VALUES
         |$centRows
         |), assigned AS (
         |  SELECT vec_id, ci FROM (
         |    SELECT e.vec_id, c.i AS ci,
         |           row_number() OVER (PARTITION BY e.vec_id
         |                ORDER BY round($cosAssign, 6) DESC, c.i ASC) AS rn
         |    FROM embeddings e CROSS JOIN cents c
         |    WHERE e.vec_id % 10 <> 0) WHERE rn = 1
         |)
         |SELECT vec_id, score FROM (
         |  SELECT e.vec_id, round($cosScore, 6) AS score
         |  FROM embeddings e JOIN assigned a USING (vec_id)
         |  WHERE a.ci IN (${probed.mkString(", ")})
         |  UNION ALL
         |  SELECT e.vec_id, round($cosScore, 6) AS score
         |  FROM embeddings e WHERE e.vec_id % 10 = 0)
         |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin
    },

    // base side: the full λ-truncated SEISMIC pipeline restricted to the
    // 90% base corpus; delta side: exact scores over the 10% newcomers;
    // merged top-k — step-for-step the searchSegmented dataflow
    "q_seismic_incremental" -> OracleGen.seismicSql(qTokensA,
      nPostings = SparkEntry.SeismicTruncNPostings, k = 10, topN = 3,
      heapFactor = 2.0f, basePredicate = "doc_id % 10 <> 0",
      deltaPredicate = Some("dv.doc_id % 10 = 0")),

    "q_lexical_bm25" -> {
      val inList = bm25Terms.map(t => s"'$t'").mkString(", ")
      // the SAME UAX#29 extraction pattern as Lexical.StandardTokenPattern
      // (RE2-safe by design); SQL doubles the apostrophes inside the literal
      val sqlPat = graft.exec.Lexical.StandardTokenPattern.replace("'", "''")
      val sqlToks =
        s"""list_filter(regexp_extract_all(lower(text), '$sqlPat'),
           |                              x -> regexp_matches(x, '[\\p{L}\\p{N}]'))""".stripMargin
      s"""WITH dl AS (
         |  SELECT doc_id,
         |         CAST(len($sqlToks) AS DOUBLE) AS dl
         |  FROM documents
         |), stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
         |toks AS (
         |  SELECT doc_id,
         |         unnest($sqlToks) AS token
         |  FROM documents
         |), tf AS (
         |  SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
         |  FROM toks WHERE token IN ($inList) GROUP BY 1, 2
         |), dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token)
         |SELECT doc_id, score FROM (
         |  SELECT t.doc_id,
         |         round(sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
         |                   * t.tf / (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl))), 6) AS score
         |  FROM tf t JOIN dfq d USING (token) JOIN dl l ON l.doc_id = t.doc_id
         |  CROSS JOIN stats s
         |  GROUP BY t.doc_id
         |) WHERE score > 0.0 ORDER BY doc_id""".stripMargin
    },

    // DSL-entered field sort ≡ the programmatic multi-sort pipeline
    "q_dsl_sorted" ->
      s"""$sortedMultiChain
         |SELECT doc_id, round(score, 4) AS score, rank
         |FROM ranked WHERE rank <= 10 ORDER BY rank""".stripMargin,

    // DSL search_after cursor ('en', 300, 50) over the k-cut 100 window
    "q_dsl_search_after" ->
      s"""$sortedMultiChain
         |SELECT r.doc_id, round(r.score, 4) AS score
         |FROM ranked r
         |WHERE r.lang > 'en'
         |   OR (r.lang = 'en' AND (r.n_chars < 300
         |       OR (r.n_chars = 300 AND r.doc_id > 50)))
         |ORDER BY r.lang ASC, r.n_chars DESC, r.doc_id ASC LIMIT 10""".stripMargin,

    "q_search_after_fields" ->
      s"""$sortedMultiChain,
         |cur AS (SELECT lang, n_chars, doc_id FROM ranked WHERE rank = 5)
         |SELECT r.doc_id, round(r.score, 4) AS score
         |FROM ranked r, cur c
         |WHERE r.lang > c.lang
         |   OR (r.lang = c.lang AND (r.n_chars < c.n_chars
         |       OR (r.n_chars = c.n_chars AND r.doc_id > c.doc_id)))
         |ORDER BY r.lang ASC, r.n_chars DESC, r.doc_id ASC LIMIT 10""".stripMargin
  )
}
