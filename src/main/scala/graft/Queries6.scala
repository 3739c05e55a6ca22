package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.exec.{HybridPipeline, NeuralQuery}
import graft.functions.VectorExpressions
import graft.ingest.Enrich
import graft.ml.{AsymmetricModel, HashEmbedder}
import graft.model._
import graft.streaming.{StreamingDedup, StreamingSessionize}

/** Sixth bank (round 3 cont.): asymmetric embedding models (query/passage
  * content types), skip_existing ingest reuse as a hard-gated query, and
  * search_after keyset pagination — each oracled.
  */
object Queries6 {

  import SparkEntry.{qTokensA, qTokensB}

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private val queryText = "spark join fast table scan"

  /** An asymmetric model per AsymmetricModelDetector (prefix-bearing
    * config): queries and passages embed differently. */
  private[graft] val asymModel =
    AsymmetricModel.ModelConfig(queryPrefix = Some("query: "), passagePrefix = Some("passage: "))

  /** The model the v1 snapshot was ingested with (skip_existing scenario:
    * embeddings persisted by an older pipeline revision are reused verbatim
    * for unchanged text — the reference's InferenceFilter compares text, not
    * model version). */
  private[graft] val v1Model = AsymmetricModel.ModelConfig(passagePrefix = Some("v1: "))

  private val Dim = HashEmbedder.DefaultDim
  private[graft] val probeVec = HashEmbedder.embed("probe basis vector for digests", Dim)

  // ------------------------------------------------- streaming gate helpers

  /** File-source stream over one of the testdata tables (schema pinned from
    * the batch footer — the production pattern for a corpus-ingest stream).
    * The FileStreamSource wants a DIRECTORY to monitor; the testdata tables
    * are single files, so stage a symlink inside a scratch dir (what a real
    * ingest landing zone is: a directory files arrive into). */
  private[graft] def streamOf(s: SparkSession, dir: String, name: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val path = s"$dir/$name.parquet"
    val streamDir =
      if (new java.io.File(path).isDirectory) path
      else {
        val src = Paths.get(path).toAbsolutePath
        val d = Paths.get("/tmp/graft_stream_src",
          src.toString.stripPrefix("/").replace('/', '_'))
        Files.createDirectories(d)
        val link = d.resolve(s"$name.parquet")
        if (!Files.exists(link)) Files.createSymbolicLink(link, src)
        d.toString
      }
    s.readStream.schema(s.read.parquet(path).schema).parquet(streamDir)
  }

  private val memSinkId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Run a streaming frame to completion with Trigger.AvailableNow into a
    * memory sink and hand back the materialized result — the batch-parity
    * protocol: the SAME logical pipeline, executed as a stream, must produce
    * the batch answer (verified by the DuckDB oracle over the same table). */
  private[graft] def runAvailableNow(df: DataFrame, mode: String): DataFrame = {
    val name = s"graft_stream_${memSinkId.incrementAndGet()}"
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // asymmetric model: corpus embedded at ingest with PASSAGE content type,
    // query text embedded with QUERY content type
    // (TextEmbeddingProcessor.java:115 / NeuralQueryBuilder.java:1162)
    "q_neural_asymmetric" -> ((s, dir) => {
      val docs = Enrich.textEmbedding(
        t(s, dir, "documents"), Map("text" -> "emb_passage"), Dim, asymModel)
      NeuralQuery.topK(
        NeuralQuery.scoreByTextAsymmetric(docs, queryText, "emb_passage", asymModel, Dim)
          .select(col("doc_id"), col("score")), 10)
    }),

    // skip_existing (TextEmbeddingInferenceFilter): the v1 snapshot covers
    // even doc_ids, with every 4th doc's text since changed; unchanged rows
    // keep the v1 embeddings verbatim, changed + new rows are re-inferred
    // with the current (symmetric) model. emb_dot probes which path each
    // row took.
    "q_embed_skip_existing" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val prev = docs.where(col("doc_id") % 2 === 0)
        .withColumn("text",
          when(col("doc_id") % 4 === 0, concat(col("text"), lit(" CHANGED")))
            .otherwise(col("text")))
        .withColumn("emb", Enrich.embedPassageUdf(Dim, v1Model)(col("text")))
      Enrich.embedWithSkipExisting(docs, prev, "doc_id", "text", "emb", Dim)
        .select(col("doc_id"),
          round(VectorExpressions.dense_dot(col("emb"), typedLit(probeVec)), 4).as("emb_dot"))
        .orderBy(col("doc_id"))
    }),

    // search_after keyset pagination over the flagship hybrid result: the
    // cursor is the page-1 row at rank 5 (as a client would resend it), the
    // page is the next 10 hits strictly after the cursor
    // (HybridTopFieldDocSortCollector.PagingFieldCollector semantics).
    "q_search_after" -> ((s, dir) => {
      val base = HybridPipeline.run(
        SparkEntry.flagshipScored(s, dir), 2,
        NormalizationSpec.MinMax(), CombinationSpec.ArithmeticMean(),
        paginationDepth = Some(100), size = 100)
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
      val cur = base.where(col("rank") === 5)
        .select(col("score"), col("doc_id")).head()
      HybridPipeline.searchAfter(
        base.drop("rank"), cur.getDouble(0), cur.getLong(1), size = 10)
    }),

    // neural_query_enricher as a request-pipeline pass: the parsed body
    // names no model; the enricher fills the default before compilation
    // (NeuralQueryEnricherProcessor.java:70-108) and the compiled query
    // must behave exactly like an explicitly-modeled one.
    "q_enricher_neural" -> ((s, dir) => {
      import graft.exec.QueryCompiler
      val req = QueryDsl.parse(
        """{"query": {"neural": {"text": {"query_text": "spark join fast table scan"}}},
          | "size": 10}""".stripMargin)
      require(req.subqueries.head.modelId.isEmpty, "body must omit model_id")
      val subs = NeuralQueryEnricher.enrich(req.subqueries, Some("hash-embedder"))
      require(subs.head.modelId.contains("hash-embedder"), "enricher must fill the default")
      QueryCompiler.run(t(s, dir, "documents"), req.copy(subqueries = subs))
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
    }),

    // agentic translation with schema-aware filter extraction: quoted
    // phrase → match, "in german" → term lang, "between 100 and 500
    // chars" → range, remainder → neural ⊕ neural_sparse (exactly the
    // ≤5-subquery budget). The reference's agent sees the index mapping in
    // its prompt; TranslatorSchema is that context for the rule stand-in.
    "q_agentic_filters" -> ((s, dir) => {
      import graft.exec.QueryCompiler
      val subs = agenticFilterSubs
      QueryCompiler.run(t(s, dir, "documents"),
        QueryCompiler.QueryRequest(subqueries = subs))
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
    }),

    // batched inference seam (InferenceProcessor.subBatchExecute): the
    // mapPartitions batch embedder must produce exactly the per-row
    // deterministic embeddings (digested against the probe vector).
    "q_embed_batched" -> ((s, dir) => {
      val out = Enrich.embedBatched(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "text", "emb", batchSize = 10)
      out.select(col("doc_id"),
        round(VectorExpressions.dense_dot(col("emb"), typedLit(probeVec)), 4).as("emb_dot"))
        .orderBy(col("doc_id"))
    }),

    // Structured-Streaming windowed aggregation (Complete mode, AvailableNow):
    // the streaming execution of the q_events_hourly aggregation must equal
    // the batch answer — batch/stream parity under the hard gate.
    "q_stream_windowed" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = SparkEntry.withTsNs(streamOf(s, dir, "events")) // normalized ts_ns
      val agg = ev
        .withColumn("ts_sec", timestamp_seconds(expr("ts_ns div 1000000000")))
        .groupBy(col("event_type"), window(col("ts_sec"), "1 hour"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
      runAvailableNow(agg, "complete")
        .select(col("event_type"),
          (unix_timestamp(col("window.start")) * 1000).as("hour_ms"),
          col("cnt"), col("sum_value"))
        .orderBy(col("event_type"), col("hour_ms"))
    }),

    // neural query with query_text + query_image (NeuralQueryBuilder.java:
    // 914-919: multimodal inference input map, one embedding per pair).
    // The query-side inference is coordinator-hoisted in the reference —
    // here, a plan-time literal from the multimodal model surface.
    "q_neural_multimodal" -> ((s, dir) => {
      val qv = HashEmbedder.embedMultimodal(
        "vector search engine query data", "aW1hZ2UtYnl0ZXM=", Dim)
      // ingest-time `emb` from the shared corpus memo (identical embedUdf
      // column — no per-query re-embedding)
      NeuralQuery.topK(
        NeuralQuery.scoreByVector(SparkEntry.docsWithTokens(s, dir), qv, "emb")
          .select(col("doc_id"), col("score")), 10)
    }),

    // neural query `rescore` (NeuralKNNQueryBuilder.java:147-256, k-NN
    // RescoreContext): first pass over byte-QUANTIZED vectors keeps
    // ceil(k × oversample) candidates, exact full-precision rescore
    // returns the top k. The quantized scan is the cheap stage at scale.
    "q_neural_rescore" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val quant = NeuralQuery.quantizeDense(emb, "embedding", "emb_q")
      NeuralQuery.topKWithRescore(quant, SparkEntry.qDense64,
        "embedding", "emb_q", k = 10, oversample = 3.0, docId = "vec_id")
    }),

    // Stateful streaming sessionization (flatMapGroupsWithState, Append):
    // per-user session/event totals after the AvailableNow run must equal
    // the batch gaps-and-islands computation (30-minute gap).
    "q_stream_sessionize" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = SparkEntry.withTsNs(streamOf(s, dir, "events"))
        .select(col("user_id"), col("ts_ns"))
        .as[StreamingSessionize.Event]
      runAvailableNow(StreamingSessionize.sessionizeAppend(ev).toDF(), "append")
        .select(col("user_id"), col("n_sessions"), col("n_events"))
        .orderBy(col("user_id"))
    }),

    // Streaming exact dedup: first-writer-wins per content hash via
    // flatMapGroupsWithState (cross-batch state; StreamingDedup). Append
    // mode + AvailableNow over the corpus file = the batch dedup relation.
    "q_stream_dedup" -> ((s, dir) => {
      import s.implicits._
      val docs = streamOf(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("text_hash"))
        .as[StreamingDedup.DocIn]
      runAvailableNow(StreamingDedup.dedupStream(docs).toDF(), "append")
        .select(col("doc_id"), col("text_hash"), col("is_duplicate"), col("keep_id"))
        .orderBy(col("doc_id"))
    })
  )

  /** Translator output shared by the q_agentic_filters query and its
    * oracle — both sides compile the SAME subquery list. */
  private[graft] lazy val agenticFilterSubs: Seq[SubquerySpec] =
    NeuralQueryEnricher.enrich(
      RuleBasedTranslator.translateWithSchema(
        "find \"spark join\" documents in german between 100 and 500 chars",
        TranslatorSchema(Seq("text"), langField = Some("lang"),
          charCountField = Some("n_chars"))),
      Some("hash-embedder"))

  // ------------------------------------------------------------- oracle SQL

  import OracleGen.{denseCosineSql, denseDotSql, doubleList, embedCte, sparseScoreSql, valuesOf}

  private val qAsymLit = doubleList(
    AsymmetricModel.embed(queryText, AsymmetricModel.ContentType.Query, asymModel, Dim))
  private val probeLit = doubleList(probeVec)

  def oracleSql: Map[String, String] = Map(
    "q_neural_asymmetric" ->
      s"""WITH ${embedCte(Dim, "'passage: ' || text")}
         |SELECT doc_id, score FROM (
         |  SELECT doc_id, round(${denseCosineSql("v", qAsymLit)}, 6) AS score
         |  FROM e_emb)
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,

    "q_embed_skip_existing" ->
      s"""WITH ${embedCte(Dim, "text", "e_")},
         |${embedCte(Dim, "'v1: ' || text", "x_")}
         |SELECT d.doc_id,
         |       round(CASE WHEN d.doc_id % 2 = 0 AND d.doc_id % 4 <> 0
         |                  THEN ${denseDotSql("x.v", probeLit)}
         |                  ELSE ${denseDotSql("e.v", probeLit)} END, 4) AS emb_dot
         |FROM documents d
         |JOIN e_emb e ON e.doc_id = d.doc_id
         |JOIN x_emb x ON x.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "q_search_after" -> {
      val chain = OracleGen.hybridCombChain(
        Seq(sparseScoreSql(valuesOf(qTokensA)), sparseScoreSql(valuesOf(qTokensB))),
        "min_max", "arithmetic_mean", k = 100)
      s"""$chain, ranked AS (
         |  SELECT doc_id, round(score, 4) AS score,
         |         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
         |  FROM comb
         |), cur AS (SELECT score, doc_id FROM ranked WHERE rank = 5)
         |SELECT r.doc_id, r.score
         |FROM ranked r, cur c
         |WHERE r.score < c.score OR (r.score = c.score AND r.doc_id > c.doc_id)
         |ORDER BY r.score DESC, r.doc_id ASC LIMIT 10""".stripMargin
    },

    "q_enricher_neural" -> {
      val neural = OracleGen.denseScoreSql(
        HashEmbedder.embed("spark join fast table scan", HashEmbedder.DefaultDim))
      OracleGen.hybridFromScores(Seq(neural), "min_max", "arithmetic_mean",
        k = 10, size = 10, preamble = embedCte(Dim))
    },

    "q_agentic_filters" -> {
      val scoreSqls = agenticFilterSubs.map { sq =>
        sq.kind match {
          case "neural" =>
            OracleGen.denseScoreSql(HashEmbedder.embed(sq.queryText.getOrElse(""), Dim))
          case "neural_sparse" | "match" =>
            sparseScoreSql(valuesOf(HashEmbedder.encode(sq.queryText.getOrElse(""))))
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
      OracleGen.hybridFromScores(scoreSqls, "min_max", "arithmetic_mean",
        k = 10, size = 10,
        preamble = OracleGen.docVectorsCte + ",\n" + embedCte(Dim))
    },

    "q_embed_batched" ->
      s"""WITH ${embedCte(Dim)}
         |SELECT doc_id, round(${denseDotSql("v", probeLit)}, 4) AS emb_dot
         |FROM e_emb ORDER BY doc_id""".stripMargin,

    "q_neural_multimodal" -> {
      val qv = HashEmbedder.embedMultimodal(
        "vector search engine query data", "aW1hZ2UtYnl0ZXM=", HashEmbedder.DefaultDim)
      s"""WITH ${embedCte(Dim)}
         |SELECT doc_id, score FROM (
         |  SELECT doc_id, round(${denseCosineSql("v", doubleList(qv))}, 6) AS score
         |  FROM e_emb)
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin
    },

    "q_neural_rescore" -> {
      val qLit = doubleList(SparkEntry.qDense64)
      // trunc (not CAST) replicates Spark's double→int cast; the REAL cast
      // after /127 replicates the engine's float dequantization
      s"""WITH dq AS (
         |  SELECT vec_id,
         |         list_transform(CAST(embedding AS DOUBLE[]),
         |           x -> CAST(CAST(trunc(x * 127.0) / 127.0 AS REAL) AS DOUBLE)) AS v
         |  FROM embeddings
         |), shortlist AS (
         |  SELECT vec_id FROM (
         |    SELECT vec_id, round(${denseCosineSql("v", qLit)}, 6) AS ascore
         |    FROM dq)
         |  ORDER BY ascore DESC, vec_id ASC LIMIT 30
         |)
         |SELECT vec_id, score FROM (
         |  SELECT e.vec_id,
         |         round(${denseCosineSql("CAST(e.embedding AS DOUBLE[])", qLit)}, 6) AS score
         |  FROM embeddings e JOIN shortlist USING (vec_id))
         |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin
    },

    "q_stream_windowed" ->
      """SELECT event_type,
        |       epoch_ms(date_trunc('hour', ts)) AS hour_ms,
        |       count(*) AS cnt, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, hour_ms""".stripMargin,

    "q_stream_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events)
        |SELECT user_id,
        |       CAST(sum(CASE WHEN prev IS NULL
        |                          OR epoch_ns(ts) - epoch_ns(prev) > 1800000000000
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_stream_dedup" ->
      """SELECT doc_id, md5(text) AS text_hash,
        |       doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate,
        |       min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
