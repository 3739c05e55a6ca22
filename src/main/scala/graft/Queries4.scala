package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.exec.{HybridPipeline, Lexical}
import graft.functions.VectorExpressions
import graft.ingest.Enrich
import graft.model._

/** Fourth bank: lexical tf-idf match, term/range filters as hybrid
  * subqueries, event sessionization, batched hybrid. */
object Queries4 {

  import SparkEntry.{qTokensA, qTokensB}
  private val qTokensC = graft.ml.HashEmbedder.encode("data row column group filter")

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def docsWithTokens(s: SparkSession, dir: String): DataFrame =
    SparkEntry.docsWithTokens(s, dir)

  private val matchTerms = Seq("spark", "join", "window", "vector")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // lexical match with pinned tf-idf scorer
    "q_match_tfidf" -> ((s, dir) => {
      val scored = Lexical.matchScore(t(s, dir, "documents"), matchTerms)
      scored.orderBy(col("score").desc, col("doc_id").asc).limit(20)
    }),

    // hybrid of lexical match ⊕ neural_sparse (the classic BM25+neural pair)
    "q_hybrid_lexical" -> ((s, dir) => {
      val docs = docsWithTokens(s, dir)
      val lex = Lexical.matchScore(t(s, dir, "documents"), matchTerms)
        .withColumnRenamed("score", "lex_score")
      val joined = docs.join(lex, Seq("doc_id"), "left")
      val sparseScore = {
        val sc = round(VectorExpressions.sparse_dot(col("tokens"), typedLit(qTokensA)), 6)
        when(sc > 0.0, sc)
      }
      val scored = HybridPipeline.score(joined, col("doc_id"),
        Seq(col("lex_score"), sparseScore))
      HybridPipeline.run(scored, 2, NormalizationSpec.MinMax(),
        CombinationSpec.ArithmeticMean(), paginationDepth = Some(100), size = 10)
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
    }),

    // term + range as filters composed with sparse scoring
    "q_term_range" -> ((s, dir) => {
      val docs = docsWithTokens(s, dir)
        .where(col("lang") === "en" && col("n_chars") >= 100 && col("n_chars") < 400)
      val scored = docs.select(col("doc_id"),
        round(VectorExpressions.sparse_dot(col("tokens"), typedLit(qTokensA)), 6).as("score"))
        .where(col("score") > 0.0)
      scored.orderBy(col("score").desc, col("doc_id").asc).limit(10)
    }),

    // event sessionization: 30-min-gap sessions per user (gaps-and-islands)
    "q_sessionize" -> ((s, dir) => {
      val ev = SparkEntry.eventsWithTsNs(s, dir) // normalized ts_ns: Long
      val wUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
      val gapNs = 30L * 60 * 1000 * 1000 * 1000
      val sessions = ev
        .withColumn("prev_ts", lag(col("ts_ns"), 1).over(wUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull || col("ts_ns") - col("prev_ts") > gapNs, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(
          wUser.rowsBetween(Window.unboundedPreceding, 0)))
      sessions
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // MLlib engines (BASELINE approach: MLlib for vectorization/indexing),
    // restructured as candidates-from-MLlib + engine-exact-rescore cascades
    // so the emitted relation is oracle-verifiable even though the MLlib
    // internals (murmur3 hashing, minhash families, BRP projections) are
    // opaque to SQL. Candidate margins are checked by MllibSpec.
    "q_mllib_tfidf" -> ((s, dir) =>
      graft.ml.MllibVectorizer.tfIdfTopKRescored(
        t(s, dir, "documents"), "spark join fast table scan", 10,
        index = Some(SparkEntry.mllibTfIdfIndex(s, dir)))),

    "q_mllib_minhash" -> ((s, dir) =>
      graft.ml.MllibVectorizer.minhashNearDupRescored(
        t(s, dir, "documents"), threshold = 0.5,
        index = Some(SparkEntry.mllibMinhashIndex(s, dir)))
        .orderBy(col("id_a"), col("id_b"))),

    "q_mllib_ann" -> ((s, dir) =>
      graft.ml.MllibVectorizer.annTopKRescored(t(s, dir, "embeddings"),
        SparkEntry.qDense64, 10, numHashTables = 6, bucketLength = 5.0)),

    // aggregations alongside hybrid (HybridAggregationProcessor, §2.5):
    // aggs consume the UNION of matched docs, not the top-k
    "q_hybrid_aggs" -> ((s, dir) => {
      val docs = docsWithTokens(s, dir)
      def matched(q: Map[String, Float]) =
        docs.select(col("doc_id"),
          round(VectorExpressions.sparse_dot(col("tokens"), typedLit(q)), 6).as("score"))
          .where(col("score") > 0.0)
      val union = matched(qTokensA).unionByName(matched(qTokensB))
        .groupBy(col("doc_id")).agg(max(col("score")).as("best_score"))
      union.join(t(s, dir, "documents").select(col("doc_id"), col("lang")), "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_matched"), round(avg(col("best_score")), 4).as("avg_best"))
        .orderBy(col("lang"))
    }),

    // near-dup cluster resolution: pairs -> connected components -> groups
    "q_dedup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.dedup.Dedup.ngramJaccardPairs(docs, threshold = 0.5)
        .select(col("id_a"), col("id_b"))
      graft.dedup.Dedup.resolveClusters(pairs, docs.select(col("doc_id").as("id")))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
        .where(col("cluster_size") > 1)
        .orderBy(col("cluster_id"))
    }),

    // 3-subquery hybrid (arity > 2 path), weighted
    "q_hybrid_3way" -> ((s, dir) => {
      val docs = docsWithTokens(s, dir)
      def sub(q: Map[String, Float]): Column = {
        val sc = round(VectorExpressions.sparse_dot(col("tokens"), typedLit(q)), 6)
        when(sc > 0.0, sc)
      }
      val scored = HybridPipeline.score(docs, col("doc_id"),
        Seq(sub(qTokensA), sub(qTokensB), sub(qTokensC)))
      HybridPipeline.run(scored, 3, NormalizationSpec.MinMax(),
        CombinationSpec.ArithmeticMean(Some(Seq(0.5, 0.3, 0.2))),
        paginationDepth = Some(100), size = 10)
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
    }),

    // full QuerySpec->DataFrame compiler path (SURVEY §3.1): 4 subquery
    // kinds + filter + collapse in one declarative request
    "q_compiler" -> ((s, dir) => {
      import graft.exec.QueryCompiler
      val req = QueryCompiler.QueryRequest(
        subqueries = Seq(
          SubquerySpec("neural", "text", queryText = Some("spark join fast table scan")),
          SubquerySpec("neural_sparse", "text", queryText = Some("spark join fast table scan")),
          SubquerySpec("term", "lang", queryText = Some("en")),
          SubquerySpec("range", "n_chars", queryText = Some("100..500"))),
        paginationDepth = Some(100), k = 10,
        collapseField = Some("source"), collapseDocsPerGroup = 2)
      QueryCompiler.run(t(s, dir, "documents"), req)
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
    }),

    // neural_sparse analyzer path: query tokens from the analyzer (weight
    // 1.0 each), no model inference — through the compiler
    "q_sparse_analyzer" -> ((s, dir) => {
      import graft.exec.QueryCompiler
      val req = QueryCompiler.QueryRequest(
        subqueries = Seq(SubquerySpec("neural_sparse", "text",
          queryText = Some("spark join fast table scan"), analyzer = Some("standard"))),
        paginationDepth = Some(100), k = 10)
      QueryCompiler.run(t(s, dir, "documents"), req)
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
    }),

    // field-sorted hybrid (HybridTopFieldDocSortCollector): K-cut AND final
    // order by n_chars desc instead of score
    "q_hybrid_sorted" -> ((s, dir) => {
      val docs = docsWithTokens(s, dir)
      def sub(q: Map[String, Float]): Column = {
        val sc = round(VectorExpressions.sparse_dot(col("tokens"), typedLit(q)), 6)
        when(sc > 0.0, sc)
      }
      val scored = HybridPipeline.score(docs, col("doc_id"), Seq(sub(qTokensA), sub(qTokensB)))
      val sortKeys = t(s, dir, "documents").select(col("doc_id"), col("n_chars").as("sort_key"))
      HybridPipeline.runSorted(scored, 2, NormalizationSpec.MinMax(),
        CombinationSpec.ArithmeticMean(), sortKeys, ascending = false,
        paginationDepth = Some(100), size = 10)
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
    }),

    // verbatim reference JSON: search body + pipeline definition parsed by
    // QueryDsl, compiled and run — the "paste your existing request" path
    "q_dsl_hybrid" -> ((s, dir) => {
      import graft.exec.QueryCompiler
      val body =
        """{"query": {"hybrid": {"pagination_depth": 100, "queries": [
          |  {"neural_sparse": {"text": {"query_text": "spark join fast table scan"}}},
          |  {"neural_sparse": {"text": {"query_text": "stream window agg merge sort batch"}}}]}},
          | "size": 10}""".stripMargin
      val pipeline =
        """{"phase_results_processors": [{"normalization-processor": {
          |  "normalization": {"technique": "min_max"},
          |  "combination": {"technique": "arithmetic_mean"}}}]}""".stripMargin
      QueryCompiler.run(t(s, dir, "documents"), QueryDsl.parse(body, Some(pipeline)))
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
    }),

    // batched hybrid: two queries (swapped subquery order) in one pipeline run
    "q_hybrid_batch" -> ((s, dir) => {
      val docs = docsWithTokens(s, dir)
      def sub(q: Map[String, Float]): Column = {
        val sc = round(VectorExpressions.sparse_dot(col("tokens"), typedLit(q)), 6)
        when(sc > 0.0, sc)
      }
      val q0 = HybridPipeline.score(docs, col("doc_id"), Seq(sub(qTokensA), sub(qTokensB)), queryId = 0L)
      val q1 = HybridPipeline.score(docs, col("doc_id"), Seq(sub(qTokensB), sub(qTokensA)), queryId = 1L)
      HybridPipeline.run(q0.unionByName(q1), 2, NormalizationSpec.MinMax(),
        CombinationSpec.ArithmeticMean(), paginationDepth = Some(100), size = 10)
        .select(col("query_id"), col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    })
  )

  // ------------------------------------------------------------- oracle SQL

  private val matchCte: String = {
    val termList = matchTerms.map(w => s"'$w'").mkString("(", ", ", ")")
    s"""lex_tok AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
       |  FROM documents
       |), lex_tf AS (
       |  SELECT doc_id, token, count(*) AS tf FROM lex_tok
       |  WHERE token IN $termList GROUP BY doc_id, token
       |), lex_df AS (
       |  SELECT token, count(*) AS df FROM lex_tf GROUP BY token
       |), lex_n AS (SELECT count(*) AS N FROM documents),
       |lex AS (
       |  SELECT tf.doc_id,
       |         round(sum(tf.tf * ln(1.0 + (lex_n.N - lex_df.df + 0.5) / (lex_df.df + 0.5))), 6) AS score
       |  FROM lex_tf tf JOIN lex_df USING (token) CROSS JOIN lex_n
       |  GROUP BY tf.doc_id HAVING score > 0.0
       |)""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    // exact term-space tf-idf cosine (MLlib-compatible formula: tf = raw
    // count, idf = ln((m+1)/(df+1)), L2 norms both sides) — the engine's
    // rescoring stage recomputes precisely this, so the MLlib candidate
    // stage only has to COVER the true top-10
    "q_mllib_tfidf" -> {
      val qt = graft.ml.HashEmbedder.tokenize("spark join fast table scan")
        .groupBy(identity).map { case (tk, ts) => (tk, ts.length) }.toSeq.sortBy(_._1)
        .map { case (tk, c) => s"('$tk', ${c.toDouble})" }.mkString(", ")
      s"""WITH tfq AS (
         |  SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf FROM (
         |    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS t
         |    FROM documents)
         |  WHERE t <> '' GROUP BY doc_id, t
         |), dfq AS (SELECT t, count(*) AS df FROM tfq GROUP BY t),
         |mq AS (SELECT count(*) AS m FROM documents),
         |wd AS (
         |  SELECT doc_id, t, tf * ln((mq.m + 1.0) / (dfq.df + 1.0)) AS w
         |  FROM tfq JOIN dfq USING (t) CROSS JOIN mq
         |), dnorm AS (SELECT doc_id, sqrt(sum(w * w)) AS dnorm FROM wd GROUP BY doc_id),
         |qt(t, qtf) AS (VALUES $qt),
         |qw AS (
         |  SELECT qt.t, qt.qtf * ln((mq.m + 1.0) / (coalesce(dfq.df, 0) + 1.0)) AS qw
         |  FROM qt LEFT JOIN dfq USING (t) CROSS JOIN mq
         |), qnorm AS (SELECT sqrt(sum(qw * qw)) AS qn FROM qw),
         |dots AS (
         |  SELECT wd.doc_id, sum(wd.w * qw.qw) AS dot
         |  FROM wd JOIN qw USING (t) GROUP BY wd.doc_id
         |)
         |SELECT doc_id, score FROM (
         |  SELECT d.doc_id,
         |         round(d.dot / (dn.dnorm * (SELECT qn FROM qnorm)), 6) AS score
         |  FROM dots d JOIN dnorm dn USING (doc_id))
         |WHERE score > 0.0
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin
    },

    // exact all-pairs shingle Jaccard ≥ 0.5 — the engine's verification
    // stage recomputes string-shingle Jaccard on the MLlib candidate pairs,
    // so the relation equals the brute-force form
    "q_mllib_minhash" ->
      s"""WITH ${OracleGen.shingleCte(3, "mm_sh")},
         |cnt AS (SELECT doc_id, count(*) AS n FROM mm_sh GROUP BY doc_id),
         |inter AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
         |  FROM mm_sh x JOIN mm_sh y ON x.s = y.s AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT a AS id_a, b AS id_b,
         |       round(i * 1.0 / (ca.n + cb.n - i), 4) AS jaccard
         |FROM inter JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
         |WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    // exact Euclidean top-10 (the BRP-LSH metric); candidates from MLlib,
    // distances recomputed by the engine's kernel
    "q_mllib_ann" -> {
      val qv = OracleGen.doubleList(SparkEntry.qDense64)
      s"""SELECT vec_id, dist FROM (
         |  SELECT vec_id,
         |         round(sqrt(list_sum(list_transform(
         |           list_zip(CAST(embedding AS DOUBLE[]), $qv),
         |           p -> (p[1] - p[2]) * (p[1] - p[2])))), 6) AS dist
         |  FROM embeddings)
         |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin
    },

    // connected components via transitive closure (recursive CTE): the
    // min reachable id IS the min-label fixpoint resolveClusters computes.
    // Closure size is bounded by sum(component size^2) — near-dup groups
    // are small, so this stays cheap at oracle scale.
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE ${OracleGen.shingleCte(3, "sh")},
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
        |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2
        |), pr AS (
        |  SELECT a AS id_a, b AS id_b
        |  FROM inter JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
        |  WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5
        |), edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pr
        |  UNION ALL SELECT id_b, id_a FROM pr
        |), reach(src, dst) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
        |), labels AS (
        |  SELECT src AS id, min(dst) AS cluster_id FROM reach GROUP BY src
        |)
        |SELECT cluster_id, count(*) AS cluster_size
        |FROM labels GROUP BY cluster_id HAVING count(*) > 1
        |ORDER BY cluster_id""".stripMargin,

    // compiler path: 4 heterogeneous subqueries (neural cosine, sparse dot,
    // term and range as constant-score 1.0 filters) + collapse on source
    "q_compiler" -> {
      val neural = OracleGen.denseScoreSql(
        graft.ml.HashEmbedder.embed("spark join fast table scan", graft.ml.HashEmbedder.DefaultDim))
      val sparse = OracleGen.sparseScoreSql(OracleGen.valuesOf(qTokensA))
      val term = "SELECT doc_id, 1.0 AS score FROM documents WHERE lang = 'en'"
      val range = "SELECT doc_id, 1.0 AS score FROM documents WHERE n_chars >= 100 AND n_chars < 500"
      OracleGen.hybridFromScores(
        Seq(neural, sparse, term, range), "min_max", "arithmetic_mean",
        k = 100, size = 10, collapse = Some(("source", 2)),
        preamble = OracleGen.docVectorsCte + ",\n" +
          OracleGen.embedCte(graft.ml.HashEmbedder.DefaultDim))
    },

    // the DSL-parsed hybrid is the same logical query as the flagship pair
    "q_dsl_hybrid" -> OracleGen.hybridSql(qTokensA, qTokensB, "min_max", "arithmetic_mean"),

    // analyzer path: same tokens at weight 1.0 through the standard hybrid
    "q_sparse_analyzer" -> {
      val analyzerTokens = graft.ml.HashEmbedder
        .tokenize("spark join fast table scan").distinct.map(_ -> 1.0f).toMap
      OracleGen.hybridFromScores(
        Seq(OracleGen.sparseScoreSql(OracleGen.valuesOf(analyzerTokens))),
        "min_max", "arithmetic_mean", k = 100, size = 10)
    },

    // field-sorted hybrid: K-cut and final rank by n_chars desc, doc_id asc
    "q_hybrid_sorted" -> {
      def kCut(name: String, values: String) =
        s"""s_$name AS (${OracleGen.sparseScoreSql(values)}),
           |k_$name AS (
           |  SELECT doc_id, score FROM (
           |    SELECT s.doc_id, s.score,
           |           row_number() OVER (ORDER BY d.n_chars DESC, s.doc_id ASC) AS rn
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
         |  SELECT c.doc_id, c.score,
         |         CAST(row_number() OVER (ORDER BY d.n_chars DESC, c.doc_id ASC) AS INT) AS rank
         |  FROM comb c JOIN documents d USING (doc_id)
         |)
         |SELECT doc_id, round(score, 4) AS score, rank
         |FROM ranked WHERE rank <= 10 ORDER BY rank""".stripMargin
    },

    "q_hybrid_aggs" -> {
      def sc(v: String) = OracleGen.sparseScoreSql(v)
      s"""WITH ${OracleGen.docVectorsCte},
         |s_a AS (${sc(OracleGen.valuesOf(qTokensA))}),
         |s_b AS (${sc(OracleGen.valuesOf(qTokensB))}),
         |u AS (
         |  SELECT doc_id, max(score) AS best_score FROM (
         |    SELECT * FROM s_a WHERE score > 0.0
         |    UNION ALL SELECT * FROM s_b WHERE score > 0.0)
         |  GROUP BY doc_id
         |)
         |SELECT d.lang, count(*) AS n_matched,
         |       round(avg(u.best_score), 4) AS avg_best
         |FROM u JOIN documents d USING (doc_id)
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin
    },
    "q_hybrid_3way" -> OracleGen.hybridSqlN(
      Seq(qTokensA, qTokensB, qTokensC), "min_max", "arithmetic_mean",
      Some(Seq(0.5, 0.3, 0.2))),
    "q_match_tfidf" ->
      s"""WITH $matchCte
         |SELECT doc_id, score FROM lex
         |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin,

    "q_hybrid_lexical" ->
      s"""WITH ${OracleGen.docVectorsCte},
         |$matchCte,
         |s_b AS (${OracleGen.sparseScoreSql(OracleGen.valuesOf(qTokensA))}),
         |k_a AS (
         |  SELECT doc_id, score FROM (
         |    SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
         |    FROM lex) WHERE rn <= 100
         |),
         |k_b AS (
         |  SELECT doc_id, score FROM (
         |    SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
         |    FROM s_b WHERE score > 0.0) WHERE rn <= 100
         |),
         |n0 AS (
         |  SELECT doc_id,
         |         CASE WHEN CAST(mx AS REAL) = CAST(mn AS REAL)
         |                   AND CAST(mx AS REAL) = CAST(score AS REAL) THEN 1.0
         |              WHEN CAST(score AS REAL) = CAST(mn AS REAL) THEN 0.001
         |              ELSE (score - mn) / (mx - mn) END AS nscore
         |  FROM (SELECT doc_id, score, min(score) OVER () AS mn, max(score) OVER () AS mx FROM k_a)
         |),
         |n1 AS (
         |  SELECT doc_id,
         |         CASE WHEN CAST(mx AS REAL) = CAST(mn AS REAL)
         |                   AND CAST(mx AS REAL) = CAST(score AS REAL) THEN 1.0
         |              WHEN CAST(score AS REAL) = CAST(mn AS REAL) THEN 0.001
         |              ELSE (score - mn) / (mx - mn) END AS nscore
         |  FROM (SELECT doc_id, score, min(score) OVER () AS mn, max(score) OVER () AS mx FROM k_b)
         |),
         |comb AS (
         |  SELECT doc_id, sum(nscore) / count(*) AS score
         |  FROM (SELECT * FROM n0 UNION ALL SELECT * FROM n1) GROUP BY doc_id
         |), ranked AS (
         |  SELECT doc_id, score,
         |         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
         |  FROM comb
         |)
         |SELECT doc_id, round(score, 4) AS score, rank
         |FROM ranked WHERE rank <= 10 ORDER BY rank""".stripMargin,

    "q_term_range" ->
      s"""WITH base AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE lang = 'en' AND n_chars >= 100 AND n_chars < 400
         |), tok AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS t FROM base
         |), dv AS (
         |  SELECT doc_id, t, CAST(1.0 + ln(1.0 + count(*)) AS REAL) AS w
         |  FROM tok WHERE t <> '' GROUP BY doc_id, t
         |), scores AS (${OracleGen.sparseScoreSql(OracleGen.valuesOf(qTokensA))})
         |SELECT doc_id, score FROM scores WHERE score > 0.0
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,

    "q_sessionize" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tns,
        |         lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events
        |), flagged AS (
        |  SELECT user_id,
        |         CASE WHEN prev IS NULL OR tns - prev > 1800000000000 THEN 1 ELSE 0 END AS new_s
        |  FROM seq
        |)
        |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events
        |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_hybrid_batch" -> {
      val h0 = OracleGen.hybridSql(qTokensA, qTokensB, "min_max", "arithmetic_mean")
      val h1 = OracleGen.hybridSql(qTokensB, qTokensA, "min_max", "arithmetic_mean")
      s"""SELECT * FROM (
         |SELECT CAST(0 AS BIGINT) AS query_id, doc_id, score, rank FROM ($h0)
         |UNION ALL
         |SELECT CAST(1 AS BIGINT) AS query_id, doc_id, score, rank FROM ($h1)
         |) ORDER BY query_id, rank""".stripMargin
    }
  )
}
