package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.HashEmbedder
import graft.post.Highlight

/** Seventh bank (round 4): sentence-level semantic highlighting (batch +
  * span relation), widened DSL parameter surface, SEISMIC batch search. */
object Queries7 {

  import SparkEntry.{docsWithTokens, qTokensA, qTokensB}

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private val queryText = "spark join fast table scan"
  private def qEmb = HashEmbedder.embed(queryText, HashEmbedder.DefaultDim)
  private def qDense64b = HashEmbedder.embed("stream window agg merge sort batch", 64)

  private def topHits(s: SparkSession, dir: String): DataFrame =
    graft.sparse.SparseRetrieval.exactTopK(docsWithTokens(s, dir), qTokensA, 5)
      .join(t(s, dir, "documents").select(col("doc_id"), col("text")), "doc_id")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-sentence span relation: the observable form of the QA span model
    // output (SentenceHighlightingRequest → highlights list of start/end) —
    // segmentation offsets, similarity, and selection all oracle-checked
    "q_highlight_sentences" -> ((s, dir) =>
      Highlight.sentenceRelation(topHits(s, dir), queryText, "text")
        .select(col("doc_id"), col("ord"), col("sent_start"), col("sent_end"),
          round(col("sim"), 6).as("sim"), col("highlighted"))
        .orderBy(col("doc_id"), col("ord"))),

    // batch-mode processor (SemanticHighlightingProcessor/BatchExecutor):
    // sub-batches of max_inference_batch_size=2 through mapPartitions —
    // must emit the same relation as the single path
    "q_highlight_batch" -> ((s, dir) =>
      Highlight.highlightBatch(topHits(s, dir), queryText, "text",
        maxInferenceBatchSize = 2)
        .select(col("doc_id"), col("score"), col("highlights"))
        .orderBy(col("doc_id"))),

    // DSL `rescore` (k-NN RescoreContext via the neural body): quantized
    // shortlist of ceil(k × oversample), exact full-precision re-rank —
    // parsed from the verbatim JSON surface and routed to topKWithRescore.
    // The embeddings table's vector column is registered as knn_vector(64)
    // so dim and the vector column resolve from the field registry.
    "q_dsl_rescore" -> ((s, dir) => {
      import graft.exec.QueryCompiler
      val body =
        """{"query": {"neural": {"embedding": {
          |  "query_text": "vector search engine query data",
          |  "rescore": {"oversample_factor": 3.0}}}},
          | "size": 10}""".stripMargin
      val req = graft.model.QueryDsl.parse(body,
        fieldSpecs = Seq(graft.model.FieldSpec("embedding", graft.model.FieldKind.Dense(64))))
      QueryCompiler.run(t(s, dir, "embeddings"), req, docId = "vec_id")
    }),

    // query-set-at-a-time IVF: one scan of the probed-cell union serves the
    // whole query batch; per-query probes restrict inside the broadcast join
    "q_ann_ivf_batch" -> ((s, dir) => {
      import graft.ann.Ann
      val emb = t(s, dir, "embeddings")
      val centroids = Ann.seededCentroids(nlist = 8, dim = 64)
      Ann.ivfTopKBatch(Ann.assign(emb, centroids, roundDp = 6), centroids,
        Map(0L -> SparkEntry.qDense64, 1L -> qDense64b), k = 10, nprobe = 4)
        .orderBy(col("query_id"), col("rank"))
    }),

    // streaming query serving: a stream of sparse query batches answered
    // against the STATIC postings index (stream-static join + stateful
    // per-query top-k) — the AvailableNow run must hash-equal the batch
    // query-set-at-a-time relation (same protocol as the other q_stream_*)
    "q_stream_search" -> ((s, dir) => {
      import s.implicits._
      // stage the query batch as ONE file in a landing dir (a file = a batch).
      // The dir name carries a fingerprint of the batch CONTENT: the _DONE
      // marker alone could serve stale parquet if the query constants change
      // between rounds — a content change lands in a fresh dir instead.
      val batch = Seq(0L -> qTokensA, 1L -> qTokensB)
        .flatMap { case (qid, m) => m.toSeq.sorted.map { case (tk, w) => (qid, tk, w) } }
      val fp = java.lang.Long.toHexString(
        batch.map(_.toString).mkString("|").hashCode.toLong & 0xffffffffL)
      val qdir = s"/tmp/graft_stream_queries/${dir.replace('/', '_')}_$fp"
      val qFile = new java.io.File(qdir)
      if (!new java.io.File(qFile, "_DONE").exists()) {
        // stage into a tmp dir and PUBLISH by atomic rename: the landing
        // dir a concurrent reader lists is fully formed or absent — the
        // parquet-files-before-_DONE window of the in-place write is gone
        val tmp = new java.io.File(qdir + ".tmp")
        batch.toDF("query_id", "token", "qw")
          .coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
        new java.io.File(tmp, "_DONE").createNewFile()
        if (!qFile.exists())
          try java.nio.file.Files.move(tmp.toPath, qFile.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch { case _: java.nio.file.FileAlreadyExistsException => () }
      }
      val qStream = s.readStream
        .schema(s.read.parquet(qdir).schema).parquet(qdir)
      val postings = graft.sparse.SparseRetrieval.buildPostings(docsWithTokens(s, dir))
      Queries6.runAvailableNow(
        graft.streaming.StreamingSearch.serveSparse(qStream, postings, k = 10).toDF(),
        "append")
        .orderBy(col("query_id"), col("rank"))
    }),

    // SEISMIC query-set-at-a-time search: the whole query batch walks the
    // clustered index in ONE plan — per-query θ seeds come from a single
    // window job instead of a driver collect per query
    "q_seismic_batch" -> ((s, dir) => {
      val docs = docsWithTokens(s, dir)
      val idx = SparkEntry.seismicTruncIndex(s, dir)
      graft.seismic.Seismic.searchBatch(idx, docs,
        Map(0L -> qTokensA, 1L -> qTokensB), k = 10, topN = 3, heapFactor = 2.0f)
        .orderBy(col("query_id"), col("rank"))
    }),

    // DSL `expand_nested` on a chunked semantic field: per-chunk cosine,
    // ScoreMode.Max per doc, through the single-subquery hybrid pipeline
    "q_dsl_expand_nested" -> ((s, dir) => {
      import graft.exec.QueryCompiler
      val body =
        s"""{"query": {"hybrid": {"pagination_depth": 100, "queries": [
           |  {"neural": {"text": {"query_text": "$queryText", "expand_nested": true}}}]}},
           | "size": 10}""".stripMargin
      val enriched = graft.ingest.Enrich.semanticField(
        t(s, dir, "documents"), "text", chunked = true, tokenLimit = 16)
      QueryCompiler.run(enriched, graft.model.QueryDsl.parse(body))
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_highlight_sentences" -> OracleGen.highlightSentencesSql(qTokensA, qEmb),
    // batch ≡ single: same oracle as q_highlight
    "q_highlight_batch" -> OracleGen.highlightTaggedSql(qTokensA, qEmb),

    // identical two-stage plan as q_neural_rescore, driven from the DSL
    "q_dsl_rescore" -> {
      val qLit = OracleGen.doubleList(HashEmbedder.embed("vector search engine query data", 64))
      s"""WITH dq AS (
         |  SELECT vec_id,
         |         list_transform(CAST(embedding AS DOUBLE[]),
         |           x -> CAST(CAST(trunc(x * 127.0) / 127.0 AS REAL) AS DOUBLE)) AS v
         |  FROM embeddings
         |), shortlist AS (
         |  SELECT vec_id FROM (
         |    SELECT vec_id, round(${OracleGen.denseCosineSql("v", qLit)}, 6) AS ascore
         |    FROM dq)
         |  ORDER BY ascore DESC, vec_id ASC LIMIT 30
         |)
         |SELECT vec_id, score FROM (
         |  SELECT e.vec_id,
         |         round(${OracleGen.denseCosineSql("CAST(e.embedding AS DOUBLE[])", qLit)}, 6) AS score
         |  FROM embeddings e JOIN shortlist USING (vec_id))
         |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin
    },

    // streaming serving ≡ batch query-set-at-a-time: identical relation to
    // the q_sparse_batch oracle (one postings pass for the query batch)
    "q_stream_search" -> {
      val batchValues = Seq(0L -> qTokensA, 1L -> qTokensB)
        .flatMap { case (qid, m) =>
          m.toSeq.sortBy(_._1).map { case (tk, w) => s"($qid, '$tk', ${OracleGen.f32(w)})" }
        }.mkString(", ")
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
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    },

    // per-query IVF pipelines over the SHARED assignment CTE, unioned with
    // query_id + per-query rank — batch must equal the per-query relation
    "q_ann_ivf_batch" -> {
      import graft.ann.Ann
      val centroids = Ann.seededCentroids(nlist = 8, dim = 64)
      val centRows = centroids.zipWithIndex
        .map { case (c, i) => s"($i, ${OracleGen.doubleList(c)})" }
        .mkString(",\n")
      val cosAssign = OracleGen.denseCosineSql("CAST(e.embedding AS DOUBLE[])", "c.c")
      def one(qid: Int, qv: Array[Float]): String = {
        val probed = Ann.probedCells(centroids, qv, nprobe = 4)
        val cosScore = OracleGen.denseCosineSql("CAST(e.embedding AS DOUBLE[])",
          OracleGen.doubleList(qv))
        s"""SELECT CAST($qid AS BIGINT) AS query_id, vec_id, score,
           |       CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC) AS INT) AS rank
           |FROM (
           |  SELECT e.vec_id, round($cosScore, 6) AS score
           |  FROM embeddings e JOIN assigned a USING (vec_id)
           |  WHERE a.ci IN (${probed.mkString(", ")}))
           |QUALIFY rank <= 10""".stripMargin
      }
      s"""WITH cents(i, c) AS (VALUES
         |$centRows
         |), assigned AS (
         |  SELECT vec_id, ci FROM (
         |    SELECT e.vec_id, c.i AS ci,
         |           row_number() OVER (PARTITION BY e.vec_id
         |                ORDER BY round($cosAssign, 6) DESC, c.i ASC) AS rn
         |    FROM embeddings e CROSS JOIN cents c) WHERE rn = 1
         |)
         |SELECT * FROM ((${one(0, SparkEntry.qDense64)}) UNION ALL (${one(1, qDense64b)}))
         |ORDER BY query_id, rank""".stripMargin
    },

    // per-query seismic pipelines unioned with query_id + per-query rank —
    // batch search must equal the per-query relation
    "q_seismic_batch" -> {
      def one(qid: Int, q: Map[String, Float]): String =
        s"""SELECT CAST($qid AS BIGINT) AS query_id, doc_id, score,
           |       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
           |FROM (${OracleGen.seismicSql(q, nPostings = SparkEntry.SeismicTruncNPostings,
                k = 10, topN = 3, heapFactor = 2.0f)})""".stripMargin
      s"""SELECT * FROM ((${one(0, qTokensA)}) UNION ALL (${one(1, qTokensB)}))
         |ORDER BY query_id, rank""".stripMargin
    },

    // chunk-max scores through the single-subquery hybrid chain
    "q_dsl_expand_nested" -> {
      val qLit = OracleGen.doubleList(HashEmbedder.embed(queryText, HashEmbedder.DefaultDim))
      val chunkScore =
        s"""SELECT doc_id, score FROM (
           |  SELECT doc_id, round(max(${OracleGen.denseCosineSql("v", qLit)}), 6) AS score
           |  FROM nc_emb GROUP BY doc_id)
           |WHERE score > 0.0""".stripMargin
      OracleGen.hybridFromScores(Seq(chunkScore), "min_max", "arithmetic_mean",
        k = 100, size = 10,
        preamble = OracleGen.chunkEmbedCte(HashEmbedder.DefaultDim, 16))
    }
  )
}
