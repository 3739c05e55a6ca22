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

  /** Two-turn conversational agentic search (memory_id, round 8): turn 1
    * states a char-count constraint, turn 2 — same memory — a quoted
    * phrase and a language filter. The translated request must carry
    * turn 1's range filter forward (latest-binding merge) and the
    * response ext must surface the memory id. Fresh store per derivation:
    * the memory is request-scoped state, and Verify/Bench invoke queries
    * repeatedly — a shared store would accumulate duplicate turns. */
  private val memTurn1 = "find docs about spark join over 200 chars"
  private val memTurn2 = "\"table scan\" in english"
  private val memId = "conv-42"
  private[graft] lazy val agenticMemorySubs: Seq[SubquerySpec] = {
    val store = new AgentMemoryStore
    val schema = TranslatorSchema(Seq("text"), langField = Some("lang"),
      charCountField = Some("n_chars"))
    RuleBasedTranslator.translateWithMemory(memTurn1, schema, memId, store)
    NeuralQueryEnricher.enrich(
      RuleBasedTranslator.translateWithMemory(memTurn2, schema, memId, store),
      Some("hash-embedder"))
  }

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
    }),

    // conversational agentic search: the compiled request is the MERGED
    // two-turn translation (carried range filter + current phrase/term),
    // and memory_id rides the response ext alongside steps + DSL
    "q_agentic_memory" -> ((s, dir) => {
      val subs = agenticMemorySubs
      val hits = QueryCompiler.run(t(s, dir, "documents"),
        QueryCompiler.QueryRequest(subqueries = subs))
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
      QueryCompiler.attachAgentContext(hits, subs, k = 10, memoryId = Some(memId))
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
    },

    "q_agentic_memory" -> {
      val subs = agenticMemorySubs
      val scoreSqls = subs.map { sq =>
        sq.kind match {
          case "neural" =>
            OracleGen.denseScoreSql(
              HashEmbedder.embed(sq.queryText.getOrElse(""), HashEmbedder.DefaultDim))
          case "neural_sparse" | "match" =>
            OracleGen.sparseScoreSql(
              OracleGen.valuesOf(HashEmbedder.encode(sq.queryText.getOrElse(""))))
          case "term" =>
            s"SELECT doc_id, 1.0 AS score FROM documents WHERE ${sq.field} = '${sq.queryText.getOrElse("")}'"
          case "range" =>
            val Array(gte, lt) = sq.queryText.getOrElse("..").split("\\.\\.", -1)
            val conds = Seq(
              if (gte.nonEmpty) Some(s"${sq.field} >= $gte") else None,
              if (lt.nonEmpty) Some(s"${sq.field} < $lt") else None).flatten
            s"SELECT doc_id, 1.0 AS score FROM documents WHERE ${conds.mkString(" AND ")}"
        }
      }
      val base = OracleGen.hybridFromScores(scoreSqls, "min_max", "arithmetic_mean",
        k = 10, size = 10,
        preamble = OracleGen.docVectorsCte + ",\n" +
          OracleGen.embedCte(HashEmbedder.DefaultDim))
      def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"
      s"""SELECT doc_id, score, rank,
         |       ${sqlLit(AgentContext.stepsSummary(subs))} AS agent_steps,
         |       ${sqlLit(AgentContext.dslQuery(subs, 10))} AS dsl_query,
         |       '$memId' AS memory_id
         |FROM ($base)""".stripMargin
    })
}
