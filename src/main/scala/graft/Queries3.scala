package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.exec.{Explain, HybridPipeline, NeuralQuery}
import graft.functions.VectorExpressions
import graft.ingest.Enrich
import graft.ml.HashEmbedder
import graft.model._
import graft.post.Highlight

/** Third bank: neural dense query paths, semantic highlighting, agentic
  * translation, pagination, collapse, explain. */
object Queries3 {

  import SparkEntry.{qTokensA, qTokensB}

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def docsWithTokens(s: SparkSession, dir: String): DataFrame =
    SparkEntry.docsWithTokens(s, dir)

  private def hybridScored(s: SparkSession, dir: String): DataFrame =
    SparkEntry.flagshipScored(s, dir)

  private val queryText = "spark join fast table scan"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // neural dense query: query-side inference is a plan-time literal, the
    // doc side scores the ingest-time `emb` column from the corpus memo
    "q_neural_dense" -> ((s, dir) =>
      NeuralQuery.topK(
        NeuralQuery.scoreByVector(docsWithTokens(s, dir),
          HashEmbedder.embed(queryText, HashEmbedder.DefaultDim), "emb")
          .select(col("doc_id"), col("score")), 10)),

    // radial variant: min_score cut instead of top-k (NeuralQueryBuilder
    // radius search: min_score/max_distance)
    "q_neural_radial" -> ((s, dir) =>
      NeuralQuery.radial(
        NeuralQuery.scoreByVector(docsWithTokens(s, dir),
          HashEmbedder.embed(queryText, HashEmbedder.DefaultDim), "emb")
          .select(col("doc_id"), col("score")), minScore = 0.5)
        .orderBy(col("doc_id"))),

    // chunked semantic target with ScoreMode.Max nested semantics
    "q_neural_chunked" -> ((s, dir) => {
      val enriched = Enrich.semanticField(
        t(s, dir, "documents"), "text", chunked = true, tokenLimit = 16)
      NeuralQuery.topK(
        NeuralQuery.chunkedMaxScore(enriched, queryText, "text_semantic_info.chunks"), 10)
    }),

    // semantic highlighting over the top sparse hits
    "q_highlight" -> ((s, dir) => {
      val top = graft.sparse.SparseRetrieval.exactTopK(docsWithTokens(s, dir), qTokensA, 5)
        .join(t(s, dir, "documents").select(col("doc_id"), col("text")), "doc_id")
      Highlight.highlight(top, queryText, "text")
        .select(col("doc_id"), col("score"), col("highlights"))
        .orderBy(col("doc_id"))
    }),

    // agentic translation: NL → spec (rule-based translator) → hybrid run
    "q_agentic" -> ((s, dir) => {
      val subs = RuleBasedTranslator.translate(
        "find docs about \"spark join\" fast table scan", Seq("text"))
      val enriched = NeuralQueryEnricher.enrich(subs, Some("hash-embedder"))
      val docs = docsWithTokens(s, dir)
      val scoreCols = enriched.map { sq =>
        val qt = sq.queryText.getOrElse("")
        sq.kind match {
          case "neural" =>
            val qv = HashEmbedder.embed(qt, HashEmbedder.DefaultDim)
            // docsWithTokens carries the ingest-time `emb` column — score it
            // directly (no per-query re-embedding of the corpus)
            val sc = round(VectorExpressions.dense_cosine(col("emb"), typedLit(qv)), 6)
            when(sc > 0.0, sc)
          case _ => // match + neural_sparse both score via token overlap here
            val sc = round(VectorExpressions.sparse_dot(
              col("tokens"), typedLit(HashEmbedder.encode(qt))), 6)
            when(sc > 0.0, sc)
        }
      }
      val scored = HybridPipeline.score(docs, col("doc_id"), scoreCols)
      HybridPipeline.run(scored, scoreCols.size, NormalizationSpec.MinMax(),
        CombinationSpec.ArithmeticMean(), paginationDepth = Some(100), size = 10)
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
    }),

    // pagination: from=5, size=5 window of the flagship hybrid
    "q_hybrid_paginated" -> ((s, dir) =>
      HybridPipeline.run(hybridScored(s, dir), 2, NormalizationSpec.MinMax(),
        CombinationSpec.ArithmeticMean(), paginationDepth = Some(100), from = 5, size = 5)
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))),

    // collapse: one group per lang, top-2 docs per group
    "q_hybrid_collapse" -> ((s, dir) => {
      val keys = t(s, dir, "documents").select(col("doc_id"), col("lang").as("collapse_key"))
      HybridPipeline.run(hybridScored(s, dir), 2, NormalizationSpec.MinMax(),
        CombinationSpec.ArithmeticMean(), paginationDepth = Some(100), size = 10,
        collapse = Some((keys, 2)))
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
    }),

    // query-set-at-a-time batch sparse retrieval: one postings pass for
    // the whole query batch (the 100 TB serving posture)
    "q_sparse_batch" -> ((s, dir) => {
      val postings = graft.sparse.SparseRetrieval.buildPostings(docsWithTokens(s, dir))
      graft.sparse.SparseRetrieval.batchTopK(
        postings, Map(0L -> qTokensA, 1L -> qTokensB), k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // hybrid with explain fragments (raw + normalized per subquery)
    "q_hybrid_explain" -> ((s, dir) =>
      Explain.runWithExplain(hybridScored(s, dir), 2, NormalizationSpec.MinMax(),
        CombinationSpec.ArithmeticMean(), paginationDepth = Some(100), size = 10)
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"),
          col("explain.technique").as("technique"),
          size(col("explain.details")).as("n_fragments"))
        .orderBy(col("rank")))
  )

  private def batchValues: String =
    Seq(0L -> qTokensA, 1L -> qTokensB).flatMap { case (qid, m) =>
      m.toSeq.sortBy(_._1).map { case (tk, w) => s"($qid, '$tk', ${OracleGen.f32(w)})" }
    }.mkString(", ")

  // query-side embedding, computed by the SAME model code the query uses,
  // inlined as an exact-double literal list
  private def qEmbLit: String =
    OracleGen.doubleList(HashEmbedder.embed(queryText, HashEmbedder.DefaultDim))

  private def denseScoreSql(qText: String): String =
    OracleGen.denseScoreSql(HashEmbedder.embed(qText, HashEmbedder.DefaultDim))

  def oracleSql: Map[String, String] = Map(
    // agentic: the SAME rule-based translation generates the oracle's
    // subquery list, so a translator change re-derives both sides
    "q_agentic" -> {
      val subs = NeuralQueryEnricher.enrich(
        RuleBasedTranslator.translate(
          "find docs about \"spark join\" fast table scan", Seq("text")),
        Some("hash-embedder"))
      val scoreSqls = subs.map { sq =>
        sq.kind match {
          case "neural" => denseScoreSql(sq.queryText.getOrElse(""))
          case _ => OracleGen.sparseScoreSql(
            OracleGen.valuesOf(HashEmbedder.encode(sq.queryText.getOrElse(""))))
        }
      }
      OracleGen.hybridFromScores(scoreSqls, "min_max", "arithmetic_mean",
        preamble = OracleGen.docVectorsCte + ",\n" +
          OracleGen.embedCte(HashEmbedder.DefaultDim))
    },

    // explain: flagship hybrid + technique literal + per-doc fragment count
    "q_hybrid_explain" -> {
      val base = OracleGen.hybridSql(qTokensA, qTokensB, "min_max", "arithmetic_mean")
      val technique = "normalization [min_max], combination [arithmetic_mean]"
      // fragment count = how many subqueries kept the doc in their top-100
      // candidate cut; recompute the two candidate sets independently
      def kCut(values: String) =
        s"""SELECT doc_id FROM (
           |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
           |  FROM (${OracleGen.sparseScoreSql(values)})) WHERE rn <= 100""".stripMargin
      s"""WITH ${OracleGen.docVectorsCte},
         |frag AS (
         |  SELECT doc_id, CAST(count(*) AS INT) AS n_fragments FROM (
         |    ${kCut(OracleGen.valuesOf(qTokensA))}
         |    UNION ALL
         |    ${kCut(OracleGen.valuesOf(qTokensB))}
         |  ) GROUP BY doc_id
         |)
         |SELECT h.doc_id, h.score, h.rank, '$technique' AS technique, frag.n_fragments
         |FROM ($base) h JOIN frag USING (doc_id) ORDER BY h.rank""".stripMargin
    },

    // chunked ScoreMode.Max: overlap-0 fixed-token chunks are contiguous
    // 16-token blocks — embed per (doc, chunk), max cosine per doc
    "q_neural_chunked" ->
      s"""WITH ${OracleGen.chunkEmbedCte(8, 16)}
         |SELECT doc_id, score FROM (
         |  SELECT doc_id, round(max(${OracleGen.denseCosineSql("v", qEmbLit)}), 6) AS score
         |  FROM nc_emb GROUP BY doc_id)
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,

    // highlight: sentence spans with character offsets over the ORIGINAL
    // text (HighlightTagApplier semantics — whitespace passes through
    // verbatim); shared generator with q_highlight_batch / _sentences
    "q_highlight" -> OracleGen.highlightTaggedSql(
      qTokensA, HashEmbedder.embed(queryText, HashEmbedder.DefaultDim)),
    "q_neural_dense" ->
      s"""WITH ${OracleGen.embedCte(HashEmbedder.DefaultDim)}
         |SELECT doc_id, score FROM (
         |  SELECT doc_id,
         |         round(${OracleGen.denseCosineSql("v", qEmbLit)}, 6) AS score
         |  FROM e_emb)
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,

    "q_neural_radial" ->
      s"""WITH ${OracleGen.embedCte(HashEmbedder.DefaultDim)}
         |SELECT doc_id, score FROM (
         |  SELECT doc_id,
         |         round(${OracleGen.denseCosineSql("v", qEmbLit)}, 6) AS score
         |  FROM e_emb)
         |WHERE score >= 0.5 ORDER BY doc_id""".stripMargin,

    "q_sparse_batch" ->
      s"""WITH ${OracleGen.docVectorsCte},
         |q(query_id, t, qw) AS (VALUES $batchValues),
         |s AS (
         |  SELECT q.query_id, dv.doc_id,
         |         round(sum(CAST(dv.w AS DOUBLE) * CAST(q.qw AS DOUBLE)), 6) AS score
         |  FROM dv JOIN q USING (t) GROUP BY 1, 2
         |)
         |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score, rank FROM (
         |  SELECT query_id, doc_id, score,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |              ORDER BY score DESC, doc_id ASC) AS INT) AS rank
         |  FROM s WHERE score > 0.0)
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "q_hybrid_paginated" -> OracleGen.hybridSql(
      qTokensA, qTokensB, "min_max", "arithmetic_mean", from = 5, size = 5),
    "q_hybrid_collapse" -> OracleGen.hybridSql(
      qTokensA, qTokensB, "min_max", "arithmetic_mean", collapse = Some(("lang", 2)))
  )
}
