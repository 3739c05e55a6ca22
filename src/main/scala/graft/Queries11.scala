package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TrainingData

/** Eleventh bank (round 8): training-data pipeline operators — benchmark
  * decontamination, deterministic stratified sampling / corpus mixing, and
  * greedy sequence packing. All three are hard-gate oracled: sampling and
  * packing are integer/hash-deterministic by construction, decontamination
  * reuses the exact-Jaccard SQL in bipartite form. */
object Queries11 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Per-language keep-quotas in 1024ths — a corpus-mixing spec. */
  private val MixQuotas = Map(
    "en" -> 410, "es" -> 307, "de" -> 205, "fr" -> 102, "zh" -> 51)

  private val PackBudget = 256
  private val PackShards = 16

  /** Same term set as q_lexical_bm25 (Queries8) — the norms variant must
    * differ ONLY in doc-length granularity. */
  private val Bm25Terms = Seq("spark", "join", "fast", "table", "scan")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // benchmark decontamination: bench split = doc_id % 50 == 0, train =
    // the rest; flag train docs with 3-gram Jaccard >= 0.5 vs any bench doc
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.decontaminate(
        docs.where(col("doc_id") % 50 =!= 0),
        docs.where(col("doc_id") % 50 === 0),
        threshold = 0.5)
        .orderBy(col("train_id"), col("bench_id"))
    }),

    // deterministic stratified sampling under the per-language mixing spec
    "q_sample_stratified" -> ((s, dir) =>
      TrainingData.stratifiedSample(t(s, dir, "documents"), "lang", MixQuotas)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // greedy token-budget packing over doc_id-mod shards
    "q_pack_greedy" -> ((s, dir) =>
      TrainingData.packGreedy(t(s, dir, "documents"), PackBudget, PackShards)
        .orderBy(col("doc_id"))),

    // BM25 with Lucene's lossy SmallFloat norm byte — full parity with
    // what a Lucene-backed cluster scores (vs q_lexical_bm25's exact-dl
    // refinement)
    "q_lexical_bm25_norms" -> ((s, dir) =>
      graft.exec.Lexical.bm25Score(t(s, dir, "documents"), Bm25Terms,
        luceneNorms = true)
        .orderBy(col("doc_id"))),

    // Gopher-rules repetition signals per doc (top-unigram / top-bigram /
    // repeated-trigram fractions)
    "q_quality_repetition" -> ((s, dir) =>
      graft.text.TextAnalysis.repetition(t(s, dir, "documents"))
        .orderBy(col("doc_id"))),

    // PQ-compressed ANN: seeded codebooks, ADC candidate scan over the
    // m-int codes, exact-cosine rescore of the window (the 100 TB memory
    // lever: 256 B/vector -> 4 B)
    "q_ann_pq" -> ((s, dir) => {
      val cb = graft.ann.Ann.seededCodebooks(m = 4, ksub = 16, subDim = 16)
      val encoded = graft.ann.Ann.pqEncode(t(s, dir, "embeddings"), cb)
      graft.ann.Ann.pqAdcTopK(encoded, cb, SparkEntry.qDense64, k = 10, window = 40)
    }),

    // embedding-space decontamination: paraphrase leakage the shingle form
    // misses — train vectors vs the broadcast bench split
    "q_decontaminate_embedding" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Dedup.decontaminateEmbedding(
        emb.where(col("vec_id") % 50 =!= 0),
        emb.where(col("vec_id") % 50 === 0),
        threshold = 0.45)
        .orderBy(col("train_id"), col("bench_id"))
    }),

    // streaming decontamination: the doc stream (train split) flagged
    // against the static bench corpus — AvailableNow run must hash-equal
    // the batch bipartite relation (same protocol as the other q_stream_*)
    "q_stream_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val stream = Queries6.streamOf(s, dir, "documents")
        .where(col("doc_id") % 50 =!= 0)
      Queries6.runAvailableNow(
        graft.streaming.StreamingDecontaminate.flagStream(
          stream, docs.where(col("doc_id") % 50 === 0), threshold = 0.5),
        "complete")
        .orderBy(col("train_id"), col("bench_id"))
    }),

    // dedup resolution: near-dup clusters -> canonical keeper per cluster
    // (longest doc, ties to lowest id) -> full-corpus keep-list
    "q_dedup_keep" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
        .select(col("id_a"), col("id_b"))
      val labels = Dedup.resolveClusters(pairs, docs.select(col("doc_id").as("id")))
      Dedup.keepCanonical(labels, docs).orderBy(col("doc_id"))
    })
  )

  // bipartite exact-Jaccard: same shingle CTE as q_dedup_ngram, split by
  // the bench predicate; intersection over train x bench postings only.
  // Shared verbatim by the batch and streaming forms — identical output is
  // the batch-parity claim.
  private val decontaminateSql =
    s"""WITH ${OracleGen.shingleCte(3, "sh")},
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |tr AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
        |be AS (SELECT * FROM sh WHERE doc_id % 50 = 0),
        |inter AS (
        |  SELECT tr.doc_id AS a, be.doc_id AS b, count(*) AS i
        |  FROM tr JOIN be ON tr.s = be.s
        |  GROUP BY 1, 2
        |)
        |SELECT a AS train_id, b AS bench_id,
        |       round(i * 1.0 / (ca.n + cb.n - i), 4) AS jaccard
        |FROM inter JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
        |WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5
        |ORDER BY train_id, bench_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_decontaminate" -> decontaminateSql,
    "q_stream_decontaminate" -> decontaminateSql,

    // PQ pipeline replicated step for step: codebook literals (the same
    // seeded Scala arrays), per-subspace rounded argmin assignment
    // (rn=1 ordered s ASC, code ASC = array_position's first-hit
    // tie-break), rounded ADC over the rounded lut literals, exact-cosine
    // rescore of the window
    "q_ann_pq" -> {
      import graft.ann.Ann
      val m = 4; val ksub = 16; val subDim = 16
      val cb = Ann.seededCodebooks(m, ksub, subDim)
      val q = SparkEntry.qDense64
      val cbRows = (for { j <- 0 until m; kk <- 0 until ksub } yield {
        val c = cb(j)(kk)
        val csq = c.map(x => x.toDouble * x.toDouble).sum
        s"($j, $kk, ${OracleGen.doubleList(c)}, $csq)"
      }).mkString(",\n")
      val lutRows = (for { j <- 0 until m; kk <- 0 until ksub } yield {
        var d = 0.0; var i = 0
        while (i < subDim) { d += q(j * subDim + i).toDouble * cb(j)(kk)(i).toDouble; i += 1 }
        val r = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        s"($j, $kk, $r)"
      }).mkString(",\n")
      val cos = OracleGen.denseCosineSql("CAST(e.embedding AS DOUBLE[])", OracleGen.doubleList(q))
      s"""WITH cb(j, kk, c, csq) AS (VALUES
         |$cbRows),
         |lut(j, kk, w) AS (VALUES
         |$lutRows),
         |subs AS (
         |  SELECT vec_id, j,
         |         CAST(embedding AS DOUBLE[])[j * $subDim + 1 : j * $subDim + $subDim] AS sv
         |  FROM embeddings CROSS JOIN (SELECT unnest(range($m)) AS j)
         |), scored AS (
         |  SELECT s.vec_id, s.j, cb.kk,
         |         round(cb.csq - 2 * ${OracleGen.denseDotSql("s.sv", "cb.c")}, 6) AS d
         |  FROM subs s JOIN cb ON cb.j = s.j
         |), codes AS (
         |  SELECT vec_id, j, kk FROM (
         |    SELECT vec_id, j, kk,
         |           row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, kk ASC) AS rn
         |    FROM scored) WHERE rn = 1
         |), adc AS (
         |  SELECT c.vec_id, round(sum(l.w), 6) AS adc
         |  FROM codes c JOIN lut l ON l.j = c.j AND l.kk = c.kk
         |  GROUP BY c.vec_id
         |), cand AS (
         |  SELECT vec_id FROM (
         |    SELECT vec_id, row_number() OVER (ORDER BY adc DESC, vec_id ASC) AS rn
         |    FROM adc) WHERE rn <= 40
         |)
         |SELECT e.vec_id, round($cos, 6) AS score
         |FROM embeddings e JOIN cand USING (vec_id)
         |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin
    },

    // the q_dedup_embedding oracle shape with the bipartite split predicate
    "q_decontaminate_embedding" -> {
      val cos = OracleGen.cosineFromNormsSql("a.v", "b.v", "a.nrm", "b.nrm")
      s"""WITH emb_n AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
         |  FROM embeddings
         |)
         |SELECT train_id, bench_id, cosine FROM (
         |  SELECT a.vec_id AS train_id, b.vec_id AS bench_id, round($cos, 6) AS cosine
         |  FROM emb_n a JOIN emb_n b ON a.vec_id % 50 <> 0 AND b.vec_id % 50 = 0)
         |WHERE cosine >= 0.45
         |ORDER BY train_id, bench_id""".stripMargin
    },

    // identical FNV-1a bucket on both engines; 1024 divides 2^32 so the
    // unsigned SQL modulus equals Java floorMod of the signed hash
    "q_sample_stratified" ->
      s"""SELECT doc_id, lang FROM documents
        |WHERE (${OracleGen.fnvSql("('doc:' || CAST(doc_id AS VARCHAR))")}) % 1024 <
        |      CASE lang WHEN 'en' THEN 410 WHEN 'es' THEN 307 WHEN 'de' THEN 205
        |                WHEN 'fr' THEN 102 WHEN 'zh' THEN 51 ELSE 0 END
        |ORDER BY doc_id""".stripMargin,

    // the greedy accumulator replayed exactly: recursive rank-stepped scan
    // per shard carrying (pack, running_total) — all-integer arithmetic,
    // no cross-engine float surface at all
    "q_pack_greedy" ->
      s"""WITH RECURSIVE toks AS (
        |  SELECT doc_id, CAST(doc_id % $PackShards AS INT) AS shard,
        |         CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
        |                              x -> x <> '')) AS INT) AS tok
        |  FROM documents
        |), ranked AS (
        |  SELECT doc_id, shard, tok,
        |         row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rk
        |  FROM toks
        |), acc AS (
        |  SELECT doc_id, shard, tok, rk, 0 AS pack, tok AS a
        |  FROM ranked WHERE rk = 1
        |  UNION ALL
        |  SELECT r.doc_id, r.shard, r.tok, r.rk,
        |         CASE WHEN a.a + r.tok > $PackBudget THEN a.pack + 1 ELSE a.pack END,
        |         CASE WHEN a.a + r.tok > $PackBudget THEN r.tok ELSE a.a + r.tok END
        |  FROM acc a JOIN ranked r ON r.shard = a.shard AND r.rk = a.rk + 1
        |)
        |SELECT doc_id, shard, CAST(pack AS INT) AS pack_id, tok AS n_tokens
        |FROM acc ORDER BY doc_id""".stripMargin,

    // the q_lexical_bm25 oracle with dl routed through the SmallFloat
    // decoded-value table: encode truncates, so quantize(dl) = max
    // representable value <= dl — the 256 decodables are inlined from the
    // SAME Scala encoder the engine scores with
    "q_lexical_bm25_norms" -> {
      val inList = Bm25Terms.map(t => s"'$t'").mkString(", ")
      val sqlPat = graft.exec.Lexical.StandardTokenPattern.replace("'", "''")
      val sqlToks =
        s"""list_filter(regexp_extract_all(lower(text), '$sqlPat'),
           |                              x -> regexp_matches(x, '[\\p{L}\\p{N}]'))""".stripMargin
      val decodable = graft.functions.SmallFloatNorm.decodedValues.distinct.sorted
        .map(v => s"($v)").mkString(", ")
      s"""WITH q4(v) AS (VALUES $decodable),
         |dl0 AS (
         |  SELECT doc_id, CAST(len($sqlToks) AS DOUBLE) AS dl_exact
         |  FROM documents
         |), dl AS (
         |  SELECT doc_id, dl_exact,
         |         CAST((SELECT max(v) FROM q4 WHERE v <= dl0.dl_exact) AS DOUBLE) AS dl
         |  FROM dl0
         |), stats AS (SELECT count(*) AS n, avg(dl_exact) AS avgdl FROM dl),
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

    // per-position gram counts via ordinality self-joins; all three
    // fractions divide the same integers the engine divides
    "q_quality_repetition" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS p,
        |         generate_subscripts(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> ''), 1) AS ord
        |  FROM documents
        |), uni AS (
        |  SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS f
        |  FROM (SELECT doc_id, p, count(*) AS c FROM tk GROUP BY 1, 2) GROUP BY doc_id
        |), big0 AS (
        |  SELECT a.doc_id, a.p || ' ' || b.p AS g
        |  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
        |), big AS (
        |  SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS f
        |  FROM (SELECT doc_id, g, count(*) AS c FROM big0 GROUP BY 1, 2) GROUP BY doc_id
        |), tri0 AS (
        |  SELECT a.doc_id, a.p || ' ' || b.p || ' ' || c.p AS g
        |  FROM tk a
        |  JOIN tk b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
        |  JOIN tk c ON c.doc_id = a.doc_id AND c.ord = a.ord + 2
        |), tri AS (
        |  SELECT doc_id,
        |         round(sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / sum(c), 6) AS f
        |  FROM (SELECT doc_id, g, count(*) AS c FROM tri0 GROUP BY 1, 2) GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |       coalesce(uni.f, 0.0) AS top_unigram_frac,
        |       coalesce(big.f, 0.0) AS top_bigram_frac,
        |       coalesce(tri.f, 0.0) AS dup_trigram_frac
        |FROM documents d
        |LEFT JOIN uni ON uni.doc_id = d.doc_id
        |LEFT JOIN big ON big.doc_id = d.doc_id
        |LEFT JOIN tri ON tri.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // same transitive-closure labels as q_dedup_clusters, then the keeper
    // rank (n_chars DESC, id ASC) per cluster — all-integer output
    "q_dedup_keep" ->
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
        |SELECT l.id AS doc_id, l.cluster_id,
        |       (row_number() OVER (PARTITION BY l.cluster_id
        |                           ORDER BY d.n_chars DESC, l.id ASC) = 1) AS kept
        |FROM labels l JOIN documents d ON d.doc_id = l.id
        |ORDER BY doc_id""".stripMargin
  )
}
