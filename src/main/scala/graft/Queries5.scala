package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.exec.{HybridPipeline, NeuralQuery, QueryCompiler}
import graft.functions.VectorExpressions
import graft.ml.HashEmbedder
import graft.model._

/** Fifth bank (round 3): post_filter, collapse inner hits, per-subquery
  * collapse, max_distance radial, enriched-corpus compiler path, skew-capped
  * ngram dedup, DSL-parsed two-phase — each oracled against the same Scala
  * constants the query uses.
  */
object Queries5 {

  import SparkEntry.{qTokensA, qTokensB}

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def docsWithTokens(s: SparkSession, dir: String): DataFrame =
    SparkEntry.docsWithTokens(s, dir)

  private val queryText = "spark join fast table scan"

  private def hybridScored(s: SparkSession, dir: String): DataFrame =
    SparkEntry.flagshipScored(s, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // max_distance radial form (NeuralQueryBuilder.java:127-175): the
    // distance-space dual of q_neural_radial's min_score cut
    "q_neural_maxdist" -> ((s, dir) =>
      NeuralQuery.radialMaxDistance(
        NeuralQuery.scoreByVector(SparkEntry.docsWithTokens(s, dir),
          graft.ml.HashEmbedder.embed(queryText, graft.ml.HashEmbedder.DefaultDim), "emb")
          .select(col("doc_id"), col("score")), maxDistance = 0.4)
        .orderBy(col("doc_id"))),

    // post_filter (HybridQueryPostFilterIT): filter applied AFTER
    // normalize/combine — normalization statistics identical to the
    // unfiltered flagship hybrid, only the hit list is restricted
    "q_hybrid_postfilter" -> ((s, dir) => {
      val allowed = t(s, dir, "documents")
        .where(col("lang") === "en").select(col("doc_id"))
      HybridPipeline.run(hybridScored(s, dir), 2, NormalizationSpec.MinMax(),
        CombinationSpec.ArithmeticMean(), paginationDepth = Some(100), size = 10,
        postFilter = Some(allowed))
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
    }),

    // collapse with inner hits (HybridQueryInnerHitsIT): one representative
    // per lang + the group's top-2 member rows, emitted flattened
    "q_hybrid_collapse_innerhits" -> ((s, dir) => {
      val keys = t(s, dir, "documents").select(col("doc_id"), col("lang").as("collapse_key"))
      HybridPipeline.runCollapseInnerHits(hybridScored(s, dir), 2,
        NormalizationSpec.MinMax(), CombinationSpec.ArithmeticMean(),
        keys, innerSize = 2, paginationDepth = Some(100), size = 5)
        .select(col("collapse_key"), col("doc_id"),
          round(col("score"), 4).as("score"), col("rank"),
          col("inner_rank"), col("inner_doc_id"),
          round(col("inner_score"), 4).as("inner_score"))
        .orderBy(col("rank"), col("inner_rank"))
    }),

    // per-subquery collapse during collection
    // (HybridCollapsingTopDocsCollector): each subquery keeps only its top-2
    // docs per lang BEFORE the K-cut and normalization
    "q_hybrid_collapse_subq" -> ((s, dir) => {
      val keys = t(s, dir, "documents").select(col("doc_id"), col("lang").as("collapse_key"))
      val collapsed = HybridPipeline.perSubqueryCollapse(hybridScored(s, dir), keys, 2)
      HybridPipeline.run(collapsed, 2, NormalizationSpec.MinMax(),
        CombinationSpec.ArithmeticMean(), paginationDepth = Some(100), size = 10)
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
    }),

    // compiler over an ENRICHED corpus: subqueries point at the ingest-time
    // emb/tokens columns — the physical plan carries no inference UDF on the
    // corpus scan (asserted in QueryCompilerSpec); results are identical to
    // q_compiler by construction
    "q_compiler_enriched" -> ((s, dir) => {
      val req = QueryCompiler.QueryRequest(
        subqueries = Seq(
          SubquerySpec("neural", "text", queryText = Some(queryText),
            vecCol = Some("emb")),
          SubquerySpec("neural_sparse", "text", queryText = Some(queryText),
            tokensCol = Some("tokens")),
          SubquerySpec("term", "lang", queryText = Some("en")),
          SubquerySpec("range", "n_chars", queryText = Some("100..500"))),
        paginationDepth = Some(100), k = 10,
        collapseField = Some("source"), collapseDocsPerGroup = 2)
      QueryCompiler.run(docsWithTokens(s, dir), req)
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
    }),

    // skew-capped ngram dedup: shingles with document frequency > 100 are
    // dropped from candidate generation (hot-bucket bound at 100 TB);
    // verification recomputes intersections over FULL shingle sets
    "q_dedup_ngram_capped" -> ((s, dir) =>
      graft.dedup.Dedup.ngramJaccardPairs(t(s, dir, "documents"),
        threshold = 0.5, maxDf = Some(100))
        .orderBy(col("id_a"), col("id_b"))),

    // verbatim reference JSON with the two-phase request processor: parsed,
    // guarded, executed as the phase-1/phase-2 cascade
    "q_dsl_two_phase" -> ((s, dir) => {
      val body =
        s"""{"query": {"neural_sparse": {"text": {"query_text": "$queryText"}}},
           | "size": 10}""".stripMargin
      val pipeline =
        """{"request_processors": [{"neural_sparse_two_phase_processor": {
          |  "enabled": true,
          |  "two_phase_parameter": {"prune_ratio": 0.4, "expansion_rate": 5.0,
          |                          "max_window_size": 10000}}}]}""".stripMargin
      val req0 = QueryDsl.parse(body, Some(pipeline))
      // route the cascade through the ingest-time tokens column
      val req = req0.copy(subqueries = req0.subqueries.map(_.copy(tokensCol = Some("tokens"))))
      QueryCompiler.run(docsWithTokens(s, dir), req)
    })
  )

  // ------------------------------------------------------------- oracle SQL

  private val tpHiQ: Map[String, Float] =
    graft.functions.PruneUtils.split(qTokensA, graft.functions.PruneUtils.MaxRatio, 0.4f)._1

  def oracleSql: Map[String, String] = Map(
    "q_neural_maxdist" ->
      s"""WITH ${OracleGen.embedCte(HashEmbedder.DefaultDim)}
         |SELECT doc_id, score, distance FROM (
         |  SELECT doc_id, score, round(1.0 - score, 6) AS distance FROM (
         |    SELECT doc_id,
         |           round(${OracleGen.denseCosineSql("v",
                OracleGen.doubleList(HashEmbedder.embed(queryText, HashEmbedder.DefaultDim)))}, 6) AS score
         |    FROM e_emb))
         |WHERE distance <= 0.4 ORDER BY doc_id""".stripMargin,

    "q_hybrid_postfilter" -> OracleGen.hybridFromScores(
      Seq(OracleGen.sparseScoreSql(OracleGen.valuesOf(qTokensA)),
        OracleGen.sparseScoreSql(OracleGen.valuesOf(qTokensB))),
      "min_max", "arithmetic_mean", k = 100, size = 10,
      postFilterWhere = Some("d.lang = 'en'")),

    "q_hybrid_collapse_subq" -> OracleGen.hybridFromScores(
      Seq(OracleGen.sparseScoreSql(OracleGen.valuesOf(qTokensA)),
        OracleGen.sparseScoreSql(OracleGen.valuesOf(qTokensB))),
      "min_max", "arithmetic_mean", k = 100, size = 10,
      subqueryCollapse = Some(("lang", 2))),

    // inner-hits: the hybrid comb CTE chain, one window pass per group,
    // reps (gr = 1) ranked + paginated, inner rows (gr <= 2) joined per key
    "q_hybrid_collapse_innerhits" -> {
      val combSql = OracleGen.hybridCombChain(
        Seq(OracleGen.sparseScoreSql(OracleGen.valuesOf(qTokensA)),
          OracleGen.sparseScoreSql(OracleGen.valuesOf(qTokensB))),
        "min_max", "arithmetic_mean", k = 100)
      s"""$combSql, grouped AS (
         |  SELECT c.doc_id, c.score, d.lang AS collapse_key,
         |         row_number() OVER (PARTITION BY d.lang
         |              ORDER BY c.score DESC, c.doc_id ASC) AS gr
         |  FROM comb c JOIN documents d USING (doc_id)
         |), reps AS (
         |  SELECT collapse_key, doc_id, score,
         |         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
         |  FROM grouped WHERE gr = 1
         |), inner_h AS (
         |  SELECT collapse_key, CAST(gr AS INT) AS inner_rank,
         |         doc_id AS inner_doc_id, score AS inner_score
         |  FROM grouped WHERE gr <= 2
         |)
         |SELECT r.collapse_key, r.doc_id, round(r.score, 4) AS score, r.rank,
         |       i.inner_rank, i.inner_doc_id, round(i.inner_score, 4) AS inner_score
         |FROM reps r JOIN inner_h i USING (collapse_key)
         |WHERE r.rank <= 5 ORDER BY r.rank, i.inner_rank""".stripMargin
    },

    // identical semantics to q_compiler — same oracle
    "q_compiler_enriched" -> {
      val neural = OracleGen.denseScoreSql(
        HashEmbedder.embed(queryText, HashEmbedder.DefaultDim))
      val sparse = OracleGen.sparseScoreSql(OracleGen.valuesOf(qTokensA))
      val term = "SELECT doc_id, 1.0 AS score FROM documents WHERE lang = 'en'"
      val range = "SELECT doc_id, 1.0 AS score FROM documents WHERE n_chars >= 100 AND n_chars < 500"
      OracleGen.hybridFromScores(
        Seq(neural, sparse, term, range), "min_max", "arithmetic_mean",
        k = 100, size = 10, collapse = Some(("source", 2)),
        preamble = OracleGen.docVectorsCte + ",\n" +
          OracleGen.embedCte(HashEmbedder.DefaultDim))
    },

    // capped candidates (shingle df <= 100), FULL-set verification
    "q_dedup_ngram_capped" ->
      s"""WITH ${OracleGen.shingleCte(3, "sh")},
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |shdf AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
         |rare AS (SELECT sh.doc_id, sh.s FROM sh JOIN shdf USING (s) WHERE shdf.df <= 100),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM rare x JOIN rare y ON x.s = y.s AND x.doc_id < y.doc_id
         |), inter AS (
         |  SELECT c.a, c.b, count(*) AS i
         |  FROM cand c
         |  JOIN sh x ON x.doc_id = c.a
         |  JOIN sh y ON y.doc_id = c.b AND y.s = x.s
         |  GROUP BY c.a, c.b
         |)
         |SELECT a AS id_a, b AS id_b,
         |       round(i * 1.0 / (ca.n + cb.n - i), 4) AS jaccard
         |FROM inter JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
         |WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    // two-phase cascade with DSL defaults: window = size × 5 = 50 hi-token
    // candidates, full-token rescore — same shape as the q_sparse_two_phase
    // oracle, regenerated from the SAME split constants
    "q_dsl_two_phase" ->
      s"""WITH ${OracleGen.docVectorsCte},
         |s_hi AS (${OracleGen.sparseScoreSql(OracleGen.valuesOf(tpHiQ))}),
         |win AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
         |    FROM s_hi WHERE score > 0.0) WHERE rn <= 50
         |),
         |full_s AS (${OracleGen.sparseScoreSql(OracleGen.valuesOf(qTokensA))})
         |SELECT f.doc_id, f.score FROM full_s f JOIN win USING (doc_id)
         |WHERE f.score > 0.0
         |ORDER BY f.score DESC, f.doc_id ASC LIMIT 10""".stripMargin
  )
}
