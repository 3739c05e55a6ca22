package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.exec.{HybridPipeline, QueryCompiler}
import graft.functions.VectorExpressions
import graft.ml.HashEmbedder
import graft.model._
import graft.post.Highlight

/** Ninth bank (round 7): word-level QA answer spans, agentic context
  * response extension. */
object Queries9 {

  import SparkEntry.{docsWithTokens, qTokensA}

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private val queryText = "spark join fast table scan"
  private def qEmb = HashEmbedder.embed(queryText, HashEmbedder.DefaultDim)

  private def topHits(s: SparkSession, dir: String): DataFrame =
    graft.sparse.SparseRetrieval.exactTopK(docsWithTokens(s, dir), qTokensA, 5)
      .join(t(s, dir, "documents").select(col("doc_id"), col("text")), "doc_id")

  private val agenticQuestion = "find docs about \"spark join\" fast table scan"

  /** The SAME translation both engines derive from (a translator change
    * re-derives query AND oracle, like q_agentic). */
  private def agenticSubs: Seq[SubquerySpec] =
    NeuralQueryEnricher.enrich(
      RuleBasedTranslator.translate(agenticQuestion, Seq("text")),
      Some("hash-embedder"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // word-level QA answer span per top hit: the sub-sentence character
    // span of the best token window inside the top sentence — the span
    // model's output shape, pinned to exact offsets
    "q_highlight_spans" -> ((s, dir) =>
      Highlight.answerSpans(topHits(s, dir), queryText, "text")
        .orderBy(col("doc_id"))),

    // agentic_context response ext: the q_agentic hit list plus the
    // agent-steps summary and translated DSL the reference attaches as a
    // response ext section — constant per response, encoded relationally
    "q_agentic_context" -> ((s, dir) => {
      val subs = agenticSubs
      val docs = docsWithTokens(s, dir)
      val scoreCols = subs.map { sq =>
        val qt = sq.queryText.getOrElse("")
        sq.kind match {
          case "neural" =>
            val qv = HashEmbedder.embed(qt, HashEmbedder.DefaultDim)
            val sc = round(VectorExpressions.dense_cosine(col("emb"), typedLit(qv)), 6)
            when(sc > 0.0, sc)
          case _ =>
            val sc = round(VectorExpressions.sparse_dot(
              col("tokens"), typedLit(HashEmbedder.encode(qt))), 6)
            when(sc > 0.0, sc)
        }
      }
      val scored = HybridPipeline.score(docs, col("doc_id"), scoreCols)
      val hits = HybridPipeline.run(scored, scoreCols.size, NormalizationSpec.MinMax(),
        CombinationSpec.ArithmeticMean(), paginationDepth = Some(100), size = 10)
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
      QueryCompiler.attachAgentContext(hits, subs, k = 10)
    }))

  def oracleSql: Map[String, String] = Map(
    "q_highlight_spans" -> OracleGen.highlightSpansSql(qTokensA, qEmb),

    "q_agentic_context" -> {
      val subs = agenticSubs
      val scoreSqls = subs.map { sq =>
        sq.kind match {
          case "neural" =>
            OracleGen.denseScoreSql(
              HashEmbedder.embed(sq.queryText.getOrElse(""), HashEmbedder.DefaultDim))
          case _ => OracleGen.sparseScoreSql(
            OracleGen.valuesOf(HashEmbedder.encode(sq.queryText.getOrElse(""))))
        }
      }
      val base = OracleGen.hybridFromScores(scoreSqls, "min_max", "arithmetic_mean",
        preamble = OracleGen.docVectorsCte + ",\n" +
          OracleGen.embedCte(HashEmbedder.DefaultDim))
      def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"
      s"""SELECT doc_id, score, rank,
         |       ${sqlLit(AgentContext.stepsSummary(subs))} AS agent_steps,
         |       ${sqlLit(AgentContext.dslQuery(subs, 10))} AS dsl_query
         |FROM ($base)""".stripMargin
    })
}
