package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ann.Ann
import graft.dedup.Dedup
import graft.exec.HybridPipeline
import graft.functions.{PruneUtils, VectorExpressions}
import graft.ingest.Enrich
import graft.ml.HashEmbedder
import graft.model._
import graft.multimodal.Multimodal
import graft.post.Rerank
import graft.seismic.Seismic
import graft.sparse.SparseRetrieval
import graft.text.TextAnalysis

/** Second bank of driver-contract queries: sparse physical variants,
  * two-phase, chunkers, dedup suite, text analysis, rerank, SEISMIC, ANN,
  * and additional hybrid technique pairs. Oracle SQL is generated from the
  * same Scala constants the queries use (query token maps, prune splits,
  * stopword lists) so both sides can never drift apart.
  */
object QueriesExtra {

  import SparkEntry.{qTokensA, qTokensB, qDense64}

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def docsWithTokens(s: SparkSession, dir: String): DataFrame =
    SparkEntry.docsWithTokens(s, dir)

  // ---------------------------------------------------------------- helpers
  import OracleGen.{valuesOf, docVectorsCte, sparseScoreSql}

  // two-phase split computed ONCE, shared by the Spark query and the oracle
  private val (tpHi, tpLo) = PruneUtils.split(qTokensA, PruneUtils.MaxRatio, 0.4f)

  private def hybridRun(s: SparkSession, dir: String, norm: NormalizationSpec,
      comb: CombinationSpec): DataFrame = {
    val docs = docsWithTokens(s, dir)
    def sub(q: Map[String, Float]): Column = {
      val sc = round(VectorExpressions.sparse_dot(col("tokens"), typedLit(q)), 6)
      when(sc > 0.0, sc)
    }
    val scored = HybridPipeline.score(docs, col("doc_id"), Seq(sub(qTokensA), sub(qTokensB)))
    HybridPipeline.run(scored, 2, norm, comb, paginationDepth = Some(100), size = 10)
      .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
  }

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // sparse: relational postings strategy (same logical op as q_sparse_exact)
    "q_sparse_postings" -> ((s, dir) => {
      val postings = SparseRetrieval.buildPostings(docsWithTokens(s, dir))
      SparseRetrieval.topK(SparseRetrieval.scorePostings(postings, qTokensA), 10)
    }),

    // sparse two-phase cascade (NeuralSparseTwoPhaseProcessor defaults)
    "q_sparse_two_phase" -> ((s, dir) =>
      SparseRetrieval.twoPhaseTopK(docsWithTokens(s, dir), qTokensA, k = 10)),

    // SEISMIC pruned sparse ANN over the λ-truncated (single-cluster,
    // randomness-free) index: the ENTIRE pipeline — byte quantization,
    // posting truncation, α-pruned summaries, θ seeding, heap_factor
    // cluster pruning, exact rescore — is replicated in the DuckDB oracle
    // (OracleGen.seismicSql). The default multi-cluster index keeps its
    // no-pruning≡exact invariant in SeismicSpec.
    "q_seismic" -> ((s, dir) => {
      // corpus is persisted by the shared ingest cache; the index comes from
      // the ingest-time memo (the reference builds SEISMIC on merge/flush —
      // queries measure search, not re-indexing)
      val docs = docsWithTokens(s, dir)
      val idx = SparkEntry.seismicTruncIndex(s, dir)
      Seismic.search(idx, docs, qTokensA, k = 10, topN = 3, heapFactor = 2.0f)
    }),

    // chunkers
    "q_chunk_fixed_char" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(Enrich.chunkFixedCharUdf(100, 0.25, -1)(col("text"))).as(Seq("idx", "chunk")))
        .orderBy(col("doc_id"), col("idx"))),

    "q_chunk_delimiter" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(Enrich.chunkDelimiterUdf(" ", -1)(col("text"))).as(Seq("idx", "chunk")))
        .orderBy(col("doc_id"), col("idx"))),

    "q_chunk_fixed_token" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(Enrich.chunkFixedTokenUdf(8, 0.25, -1)(col("text"))).as(Seq("idx", "chunk")))
        .orderBy(col("doc_id"), col("idx"))),

    // dedup suite
    "q_dedup_ngram" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))),

    // prefix-filtered ngram dedup: EXACT recall at the threshold (so the
    // oracle is the q_dedup_ngram oracle verbatim), but candidate
    // generation joins only each doc's rarest-shingle prefix — the hot
    // buckets never enter the self-join. The 100 TB path.
    "q_dedup_ngram_prefix" -> ((s, dir) =>
      Dedup.ngramJaccardPairsPrefix(t(s, dir, "documents"), threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))),

    // auto-dispatched ngram dedup: a corpus-stat probe picks uncapped /
    // capped / prefix (the approximate_threshold idea applied to dedup),
    // so the uncapped form's quadratic regimes are never the default. The
    // fixture's density lands in the uncapped regime; the oracle is the
    // exact-recall jaccard SQL, which the auto contract guarantees
    // everywhere outside the boilerplate (capped) regime.
    "q_dedup_ngram_auto" -> ((s, dir) => {
      // The oracle below is the EXACT-jaccard SQL, which auto matches only
      // when the probe dispatches an exact-recall strategy. The dispatch is
      // data-dependent: if a testdata regeneration ever lands this corpus
      // in the boilerplate (capped) regime, fail LOUD as a fixture problem
      // instead of a spurious engine/oracle divergence (or a silent recall
      // difference that happens to hash-match).
      val (strat, pairs) = Dedup.ngramJaccardAutoWithStrategy(
        t(s, dir, "documents"), threshold = 0.5)
      require(strat != "capped",
        "q_dedup_ngram_auto fixture dispatches 'capped': that regime " +
          "trades recall, so the exact-jaccard oracle no longer applies — " +
          "regenerated testdata changed the corpus density; repin the gate")
      pairs.orderBy(col("id_a"), col("id_b"))
    }),

    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashLsh(t(s, dir, "documents"), threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))),

    "q_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), maxHamming = 6)
        .orderBy(col("id_a"), col("id_b"))),

    "q_dedup_embedding" -> ((s, dir) =>
      Dedup.embeddingNearDupBrute(t(s, dir, "embeddings"), threshold = 0.45)
        .orderBy(col("id_a"), col("id_b"))),

    "q_dedup_embedding_lsh" -> ((s, dir) =>
      Dedup.embeddingNearDupLsh(t(s, dir, "embeddings"), dim = 64,
        threshold = 0.45, nbits = 4, tables = 8)
        .orderBy(col("id_a"), col("id_b"))),

    // text analysis
    "q_lang_id" -> ((s, dir) =>
      TextAnalysis.langId(t(s, dir, "documents"))
        .select(col("doc_id"), col("pred_lang")).orderBy(col("doc_id"))),

    "q_text_quality" -> ((s, dir) =>
      TextAnalysis.quality(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_tokens"), col("mean_word_len"),
          col("stopword_ratio"), col("punct_ratio"), col("quality_score"))
        .orderBy(col("doc_id"))),

    "q_token_count" -> ((s, dir) =>
      TextAnalysis.tokenCounts(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_tokens"), col("n_subword_est"))
        .orderBy(col("doc_id"))),

    "q_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(t(s, dir, "documents"))
        .select(col("doc_id"), col("fp_md5"), col("fp_rolling"))
        .orderBy(col("doc_id"))),

    // rerank family
    "q_rerank_byfield" -> ((s, dir) => {
      val docs = docsWithTokens(s, dir)
      val top = SparseRetrieval.exactTopK(docs, qTokensA, 50)
      Rerank.byField(top.join(t(s, dir, "documents").select(col("doc_id"), col("n_chars")), "doc_id"),
        "n_chars")
        .select(col("doc_id"), col("score"))
        .limit(10)
    }),

    "q_rerank_ml" -> ((s, dir) => {
      val docs = docsWithTokens(s, dir)
      val top = SparseRetrieval.exactTopK(docs, qTokensA, 50)
        .join(t(s, dir, "documents").select(col("doc_id"), col("text")), "doc_id")
      Rerank.mlRerank(top, "spark join fast table scan", "text")
        .select(col("doc_id"), col("score")).limit(10)
    }),

    "q_mmr" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cands = Ann.bruteForceTopK(emb, qDense64, 50)
        .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
        .withColumnRenamed("vec_id", "doc_id")
      Rerank.mmrRerank(cands, "embedding", k = 10, lambda = 0.5, candidates = 50)
    }),

    // ANN scale path: IVF with the SEEDED coarse quantizer (the centroid
    // literals are inlined into the oracle like Dedup.lshPlanes; the
    // trained-centroid variant keeps its full-probe≡brute invariant in
    // AnnSpec). Cell assignment rounds cosines to 6dp before the argmax so
    // both engines assign identically.
    "q_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val centroids = Ann.seededCentroids(nlist = 8, dim = 64)
      Ann.ivfTopK(Ann.assign(emb, centroids, roundDp = 6), centroids, qDense64, 10, nprobe = 4)
    }),

    // ingest enrichment (semantic field pipeline) — summary stats output
    "q_enrich_semantic" -> ((s, dir) => {
      val enriched = Enrich.semanticField(
        t(s, dir, "documents"), "text", chunked = true, tokenLimit = 32)
      enriched.select(col("doc_id"),
        size(col("text_semantic_info.chunks")).as("n_chunks"),
        round(VectorExpressions.dense_dot(
          element_at(col("text_semantic_info.chunks"), 1).getField("embedding"),
          element_at(col("text_semantic_info.chunks"), 1).getField("embedding")), 4).as("first_norm2"))
        .orderBy(col("doc_id"))
    }),

    // multimodal plumbing (payload = utf8 bytes of text; decode is stubbed)
    "q_multimodal" -> ((s, dir) => {
      val withPayload = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      Multimodal.extractFeatures(withPayload, "payload", dim = 8)
        .select(col("doc_id"),
          round(VectorExpressions.dense_dot(col("media_features"), col("media_features")), 4).as("feat_norm2"))
        .orderBy(col("doc_id"))
    }),

    // more hybrid technique pairs
    "q_hybrid_l2_geo" -> ((s, dir) =>
      hybridRun(s, dir, NormalizationSpec.L2, CombinationSpec.GeometricMean())),
    "q_hybrid_zscore" -> ((s, dir) =>
      hybridRun(s, dir, NormalizationSpec.ZScore, CombinationSpec.ArithmeticMean())),
    "q_hybrid_weighted" -> ((s, dir) =>
      hybridRun(s, dir, NormalizationSpec.MinMax(),
        CombinationSpec.ArithmeticMean(Some(Seq(0.7, 0.3))))),
    "q_hybrid_harmonic" -> ((s, dir) =>
      hybridRun(s, dir, NormalizationSpec.MinMax(), CombinationSpec.HarmonicMean()))
  )

  // ------------------------------------------------------------- oracle SQL

  private def langIdSql: String = {
    val toks = "list_filter(string_split(lower(text), ' '), x -> x <> '')"
    def hits(lang: String): String = {
      val lst = TextAnalysis.stopwords(lang).map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter($toks, x -> list_contains($lst, x)))"
    }
    var bl = "'und'"; var bh = "0"
    TextAnalysis.stopwords.keys.toSeq.sorted.foreach { l =>
      val h = hits(l)
      bl = s"CASE WHEN $h > $bh THEN '$l' ELSE $bl END"
      bh = s"CASE WHEN $h > $bh THEN $h ELSE $bh END"
    }
    s"SELECT doc_id, $bl AS pred_lang FROM documents ORDER BY doc_id"
  }

  def oracleSql: Map[String, String] = Map(
    // the whole SEISMIC build+search pipeline in SQL (valid because the
    // λ-truncated build is single-cluster and randomness-free)
    "q_seismic" -> OracleGen.seismicSql(qTokensA,
      nPostings = SparkEntry.SeismicTruncNPostings, k = 10, topN = 3,
      heapFactor = 2.0f),

    // IVF: seeded centroid literals + rounded-argmax assignment + probed
    // cells (computed by the same Scala code the query uses) + exact cosine
    "q_ann_ivf" -> {
      val centroids = Ann.seededCentroids(nlist = 8, dim = 64)
      val probed = Ann.probedCells(centroids, qDense64, nprobe = 4)
      val centRows = centroids.zipWithIndex
        .map { case (c, i) => s"($i, ${OracleGen.doubleList(c)})" }
        .mkString(",\n")
      val cosAssign = OracleGen.denseCosineSql("CAST(e.embedding AS DOUBLE[])", "c.c")
      val cosScore = OracleGen.denseCosineSql("CAST(e.embedding AS DOUBLE[])",
        OracleGen.doubleList(qDense64))
      s"""WITH cents(i, c) AS (VALUES
         |$centRows
         |), assigned AS (
         |  SELECT vec_id, ci FROM (
         |    SELECT e.vec_id, c.i AS ci,
         |           row_number() OVER (PARTITION BY e.vec_id
         |                ORDER BY round($cosAssign, 6) DESC, c.i ASC) AS rn
         |    FROM embeddings e CROSS JOIN cents c) WHERE rn = 1
         |)
         |SELECT vec_id, score FROM (
         |  SELECT e.vec_id, round($cosScore, 6) AS score
         |  FROM embeddings e JOIN assigned a USING (vec_id)
         |  WHERE a.ci IN (${probed.mkString(", ")}))
         |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin
    },

    "q_sparse_postings" ->
      s"""WITH $docVectorsCte,
         |scores AS (${sparseScoreSql(valuesOf(qTokensA))})
         |SELECT doc_id, score FROM scores WHERE score > 0.0
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,

    "q_sparse_two_phase" ->
      s"""WITH $docVectorsCte,
         |s_hi AS (${sparseScoreSql(valuesOf(tpHi))}),
         |win AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
         |    FROM s_hi WHERE score > 0.0) WHERE rn <= 50
         |),
         |full_s AS (${sparseScoreSql(valuesOf(qTokensA))})
         |SELECT f.doc_id, f.score FROM full_s f JOIN win USING (doc_id)
         |WHERE f.score > 0.0
         |ORDER BY f.score DESC, f.doc_id ASC LIMIT 10""".stripMargin,

    "q_chunk_fixed_char" ->
      """SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS INT) AS idx,
        |       substring(text, s + 1, 100) AS chunk
        |FROM (SELECT doc_id, text, unnest(range(0, length(text), 75)) AS s FROM documents)
        |WHERE s = 0 OR s - 75 + 100 < length(text)
        |ORDER BY doc_id, idx""".stripMargin,

    "q_chunk_delimiter" ->
      """SELECT doc_id, CAST(ord - 1 AS INT) AS idx,
        |       CASE WHEN ord < n THEN p || ' ' ELSE p END AS chunk
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS p,
        |             generate_subscripts(string_split(text, ' '), 1) AS ord,
        |             len(string_split(text, ' ')) AS n
        |      FROM documents)
        |WHERE NOT (ord = n AND p = '')
        |ORDER BY doc_id, idx""".stripMargin,

    // fixed_token chunker: token_limit 8, overlap 2 (rate .25) → step 6.
    // single-space corpus ⇒ chunk i = tokens [s+1 .. s+8] joined, with a
    // trailing space unless it is the final chunk (runs to end of text).
    "q_chunk_fixed_token" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk, len(string_split(text, ' ')) AS n
        |  FROM documents
        |), starts AS (
        |  SELECT doc_id, tk, n, unnest(range(0, n, 6)) AS s FROM toks
        |)
        |SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS INT) AS idx,
        |       CASE WHEN s + 8 >= n THEN array_to_string(tk[s+1:n], ' ')
        |            ELSE array_to_string(tk[s+1:s+8], ' ') || ' ' END AS chunk
        |FROM starts WHERE s = 0 OR s - 6 + 8 < n
        |ORDER BY doc_id, idx""".stripMargin,

    // prefix filtering is recall-EXACT at the threshold, so its oracle is
    // the plain exact-join oracle — identical output is the whole claim
    "q_dedup_ngram_prefix" ->
      s"""WITH ${OracleGen.shingleCte(3, "sh")},
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
        |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT a AS id_a, b AS id_b,
        |       round(i * 1.0 / (ca.n + cb.n - i), 4) AS jaccard
        |FROM inter JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
        |WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_ngram" ->
      s"""WITH ${OracleGen.shingleCte(3, "sh")},
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
        |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT a AS id_a, b AS id_b,
        |       round(i * 1.0 / (ca.n + cb.n - i), 4) AS jaccard
        |FROM inter JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
        |WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // auto form: the probe dispatches to an EXACT-recall strategy on this
    // corpus (uncapped or prefix — both reproduce full jaccard semantics),
    // so the oracle is the exact-jaccard SQL verbatim
    "q_dedup_ngram_auto" ->
      s"""WITH ${OracleGen.shingleCte(3, "sh")},
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
        |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT a AS id_a, b AS id_b,
        |       round(i * 1.0 / (ca.n + cb.n - i), 4) AS jaccard
        |FROM inter JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
        |WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_embedding" -> {
      val cos = OracleGen.cosineFromNormsSql("a.v", "b.v", "a.nrm", "b.nrm")
      s"""WITH emb_n AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
         |  FROM embeddings
         |)
         |SELECT id_a, id_b, cosine FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, round($cos, 6) AS cosine
         |  FROM emb_n a JOIN emb_n b ON a.vec_id < b.vec_id)
         |WHERE cosine >= 0.45 ORDER BY id_a, id_b""".stripMargin
    },

    "q_lang_id" -> langIdSql,

    "q_text_quality" -> {
      val allStop = TextAnalysis.stopwords.values.flatten.toSeq.distinct
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |         list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk,
         |         CAST(length(text) AS DOUBLE) AS nc
         |  FROM documents
         |)
         |SELECT doc_id,
         |       CAST(len(tk) AS INT) AS n_tokens,
         |       CASE WHEN len(tk) > 0
         |            THEN round((nc - (len(tk) - 1)) / len(tk), 4) ELSE 0.0 END AS mean_word_len,
         |       CASE WHEN len(tk) > 0
         |            THEN round(len(list_filter(tk, x -> list_contains($allStop, x))) * 1.0 / len(tk), 4)
         |            ELSE 0.0 END AS stopword_ratio,
         |       CASE WHEN nc > 0
         |            THEN round((nc - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) / nc, 4)
         |            ELSE 0.0 END AS punct_ratio,
         |       round(least(1.0, len(tk) / 20.0) *
         |             (1.0 - CASE WHEN nc > 0
         |                    THEN round((nc - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) / nc, 4)
         |                    ELSE 0.0 END), 4) AS quality_score
         |FROM base ORDER BY doc_id""".stripMargin
    },

    "q_token_count" ->
      """SELECT doc_id,
        |       CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS INT) AS n_tokens,
        |       CAST(list_sum(list_transform(
        |         list_filter(string_split(lower(text), ' '), x -> x <> ''),
        |         x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS n_subword_est
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_rerank_byfield" ->
      s"""WITH $docVectorsCte,
         |scores AS (${sparseScoreSql(valuesOf(qTokensA))}),
         |top50 AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
         |    FROM scores WHERE score > 0.0) WHERE rn <= 50
         |)
         |SELECT d.doc_id, CAST(d.n_chars AS DOUBLE) AS score
         |FROM documents d JOIN top50 USING (doc_id)
         |ORDER BY score DESC, d.doc_id ASC LIMIT 10""".stripMargin,

    // SimHash all-pairs oracle: the 64-bit fingerprint is recomputed in SQL
    // (FNV halves, weighted bit votes), kept as two BIGINT halves, hamming =
    // bit_count(xor) per half. With the pigeonhole chunk blocking the Spark
    // side is exhaustive for d <= maxHamming, so it must equal this
    // brute-force form exactly.
    "q_dedup_simhash" -> {
      val fnvT = OracleGen.fnvSql("t")
      val fnvR = OracleGen.fnvSql("reverse(t) || '#'")
      s"""WITH sh_tok AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS t FROM documents
         |), sh_cnt AS (
         |  SELECT doc_id, t, count(*) AS c FROM sh_tok WHERE t <> '' GROUP BY doc_id, t
         |), sh_hash AS (
         |  SELECT t, $fnvT AS h1, $fnvR AS h2
         |  FROM (SELECT DISTINCT t FROM sh_cnt)
         |), sh_bits AS (
         |  SELECT doc_id, b.i,
         |         sum(CASE WHEN (CASE WHEN b.i < 32 THEN (h2 >> b.i) & 1
         |                        ELSE (h1 >> (b.i - 32)) & 1 END) = 1
         |             THEN c ELSE -c END) AS acc
         |  FROM sh_cnt JOIN sh_hash USING (t)
         |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i) b
         |  GROUP BY doc_id, b.i
         |), sh_fp AS (
         |  SELECT doc_id,
         |         CAST(sum(CASE WHEN acc > 0 AND i < 32 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS lo,
         |         CAST(sum(CASE WHEN acc > 0 AND i >= 32 THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END) AS BIGINT) AS hi
         |  FROM sh_bits GROUP BY doc_id
         |)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INT) AS hamming
         |FROM sh_fp a JOIN sh_fp b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 6
         |ORDER BY id_a, id_b""".stripMargin
    },

    // MinHash-LSH oracle: same seeded universal-hash family inlined as
    // literals; band equality = signature-slice equality (the xxhash bucket
    // key on the Spark side is injective up to hash collisions, which the
    // Jaccard verification absorbs).
    "q_dedup_minhash" -> {
      val params = Dedup.hashParams(32, 42L).zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
      val fnvS = OracleGen.fnvSql("s")
      s"""WITH ${OracleGen.shingleCte(3, "mh_sh")},
         |mh_n AS (SELECT doc_id, count(*) AS n FROM mh_sh GROUP BY doc_id),
         |mh_x AS (SELECT s, $fnvS AS x FROM (SELECT DISTINCT s FROM mh_sh)),
         |mh_params(i, a, b) AS (VALUES $params),
         |mh_sig AS (
         |  SELECT doc_id, p.i,
         |         CAST(min((CAST(p.a AS HUGEINT) * x.x + p.b) % ${Dedup.P}) AS BIGINT) AS sig
         |  FROM mh_sh sh JOIN mh_x x USING (s) CROSS JOIN mh_params p
         |  GROUP BY doc_id, p.i
         |), mh_band AS (
         |  SELECT doc_id, i // 4 AS band, list(sig ORDER BY i) AS bsig
         |  FROM mh_sig GROUP BY doc_id, band
         |), mh_cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM mh_band a JOIN mh_band b
         |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
         |), mh_inter AS (
         |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS i
         |  FROM mh_sh x JOIN mh_sh y ON x.s = y.s AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT c.id_a, c.id_b,
         |       round(i.i * 1.0 / (ca.n + cb.n - i.i), 4) AS jaccard
         |FROM mh_cand c
         |JOIN mh_inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
         |JOIN mh_n ca ON ca.doc_id = c.id_a
         |JOIN mh_n cb ON cb.doc_id = c.id_b
         |WHERE round(i.i * 1.0 / (ca.n + cb.n - i.i), 4) >= 0.5
         |ORDER BY c.id_a, c.id_b""".stripMargin
    },

    // ml rerank: cross-encoder stand-in = dot of normalized hash embeddings,
    // cast through REAL exactly as HashEmbedder.similarity returns Float
    "q_rerank_ml" -> {
      val qv = OracleGen.doubleList(
        HashEmbedder.embed("spark join fast table scan", HashEmbedder.DefaultDim))
      s"""WITH $docVectorsCte,
         |scores AS (${sparseScoreSql(valuesOf(qTokensA))}),
         |top50 AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
         |    FROM scores WHERE score > 0.0) WHERE rn <= 50
         |),
         |${OracleGen.embedCte(HashEmbedder.DefaultDim)}
         |SELECT doc_id,
         |       round(CAST(CAST(${OracleGen.denseDotSql("v", qv)} AS REAL) AS DOUBLE), 6) AS score
         |FROM e_emb JOIN top50 USING (doc_id)
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin
    },

    // fingerprints: md5 is native; the Rabin-Karp base-31 mod-(2^61-1)
    // rolling hash folds the ordered token FNV list in HUGEINT arithmetic
    "q_fingerprint" -> {
      val fnvP = OracleGen.fnvSql("p")
      val M = (1L << 61) - 1
      s"""WITH fp_parts AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS p,
         |         generate_subscripts(regexp_split_to_array(lower(text), '\\s+'), 1) AS ord
         |  FROM documents
         |), fp_hash AS (
         |  SELECT p, $fnvP AS th FROM (SELECT DISTINCT p FROM fp_parts WHERE p <> '')
         |), fp_list AS (
         |  SELECT f.doc_id, list(h.th ORDER BY f.ord) AS hl
         |  FROM fp_parts f JOIN fp_hash h USING (p)
         |  WHERE f.p <> '' GROUP BY f.doc_id
         |)
         |SELECT d.doc_id,
         |       md5(d.text) AS fp_md5,
         |       list_reduce(
         |         list_prepend(CAST(0 AS BIGINT), coalesce(l.hl, [])),
         |         (h, th) -> CAST((CAST(h AS HUGEINT) * 31 % $M + th) % $M AS BIGINT)
         |       ) AS fp_rolling
         |FROM documents d LEFT JOIN fp_list l USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },

    // semantic-field enrichment summary: chunk count is ceil(n/32) for the
    // overlap-0 fixed-token chunker; first-chunk embedding rebuilt from the
    // first min(32, n) tokens with the float-cast normalize
    "q_enrich_semantic" -> {
      val fnvP = OracleGen.fnvSql("p")
      s"""WITH es_parts AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS p,
         |         generate_subscripts(string_split(lower(text), ' '), 1) AS ord
         |  FROM documents
         |), es_n AS (
         |  SELECT doc_id, count(*) AS n FROM es_parts WHERE p <> '' GROUP BY doc_id
         |), es_cnt AS (
         |  SELECT doc_id, p, count(*) AS c FROM es_parts
         |  WHERE p <> '' AND ord <= 32 GROUP BY doc_id, p
         |), es_hash AS (
         |  SELECT p, $fnvP % 8 AS idx FROM (SELECT DISTINCT p FROM es_cnt)
         |), es_idx AS (
         |  SELECT doc_id, idx, CAST(sum(c) AS DOUBLE) AS c
         |  FROM es_cnt JOIN es_hash USING (p) GROUP BY doc_id, idx
         |), es_vec AS (
         |  SELECT d.doc_id, list(coalesce(e.c, 0.0) ORDER BY g.i) AS cnts
         |  FROM (SELECT DISTINCT doc_id FROM documents) d
         |  CROSS JOIN (SELECT unnest(range(0, 8)) AS i) g
         |  LEFT JOIN es_idx e ON e.doc_id = d.doc_id AND e.idx = g.i
         |  GROUP BY d.doc_id
         |), es_emb AS (
         |  SELECT doc_id,
         |         CASE WHEN nrm > 0
         |              THEN list_transform(cnts, x -> CAST(CAST(x / nrm AS REAL) AS DOUBLE))
         |              ELSE cnts END AS v
         |  FROM (SELECT doc_id, cnts,
         |               sqrt(list_sum(list_transform(cnts, x -> x * x))) AS nrm
         |        FROM es_vec)
         |)
         |SELECT e.doc_id,
         |       CAST(ceil(n.n * 1.0 / 32) AS INT) AS n_chunks,
         |       round(list_sum(list_transform(e.v, x -> x * x)), 4) AS first_norm2
         |FROM es_emb e JOIN es_n n USING (doc_id)
         |ORDER BY e.doc_id""".stripMargin
    },

    // multimodal stub features: v[(byte_i + i*31) mod 8] += 1 over the
    // utf-8 payload (ASCII corpus: byte = codepoint), float-cast normalize,
    // feat_norm2 = sum of squares
    "q_multimodal" ->
      """WITH mm_pos AS (
        |  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM documents
        |), mm_idx AS (
        |  SELECT doc_id, CAST((unicode(substr(text, i, 1)) + (i - 1) * 31) % 8 AS INT) AS idx,
        |         count(*) AS c
        |  FROM mm_pos GROUP BY 1, 2
        |), mm_vec AS (
        |  SELECT d.doc_id, list(coalesce(CAST(m.c AS DOUBLE), 0.0) ORDER BY g.i) AS cnts
        |  FROM (SELECT DISTINCT doc_id FROM documents) d
        |  CROSS JOIN (SELECT unnest(range(0, 8)) AS i) g
        |  LEFT JOIN mm_idx m ON m.doc_id = d.doc_id AND m.idx = g.i
        |  GROUP BY d.doc_id
        |), mm_emb AS (
        |  SELECT doc_id,
        |         CASE WHEN nrm > 0
        |              THEN list_transform(cnts, x -> CAST(CAST(x / nrm AS REAL) AS DOUBLE))
        |              ELSE cnts END AS v
        |  FROM (SELECT doc_id, cnts,
        |               sqrt(list_sum(list_transform(cnts, x -> x * x))) AS nrm
        |        FROM mm_vec)
        |)
        |SELECT doc_id, round(list_sum(list_transform(v, x -> x * x)), 4) AS feat_norm2
        |FROM mm_emb ORDER BY doc_id""".stripMargin,

    // embedding LSH: the same seeded hyperplanes inlined as exact-double
    // literals; candidate = all-bits-equal in >=1 table, then exact cosine
    "q_dedup_embedding_lsh" -> {
      val planes = Dedup.lshPlanes(tables = 8, nbits = 4, dim = 64, seed = 42L)
      val planeRows = (for {
        t <- 0 until 8; b <- 0 until 4
      } yield s"($t, $b, ${OracleGen.doubleList(planes(t)(b))})").mkString(",\n")
      s"""WITH lsh_planes(t, b, pl) AS (VALUES
         |$planeRows
         |), lsh_bits AS (
         |  SELECT e.vec_id, p.t, p.b,
         |         CASE WHEN ${OracleGen.denseDotSql("CAST(e.embedding AS DOUBLE[])", "p.pl")} >= 0
         |              THEN 1 ELSE 0 END AS bit
         |  FROM embeddings e CROSS JOIN lsh_planes p
         |), lsh_sig AS (
         |  SELECT vec_id, t, list(bit ORDER BY b) AS sig FROM lsh_bits GROUP BY vec_id, t
         |), lsh_cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM lsh_sig a JOIN lsh_sig b
         |    ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
         |), lsh_emb_n AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
         |  FROM embeddings
         |)
         |SELECT id_a, id_b, cosine FROM (
         |  SELECT c.id_a, c.id_b,
         |         round(${OracleGen.cosineFromNormsSql("ea.v", "eb.v", "ea.nrm", "eb.nrm")}, 6) AS cosine
         |  FROM lsh_cand c
         |  JOIN lsh_emb_n ea ON ea.vec_id = c.id_a
         |  JOIN lsh_emb_n eb ON eb.vec_id = c.id_b)
         |WHERE cosine >= 0.45 ORDER BY id_a, id_b""".stripMargin
    },

    // MMR greedy selection as a recursive CTE: level N carries the selected
    // id list; the LATERAL picks argmax of lambda*rel - (1-lambda)*maxSim
    // with the same (value desc, id asc) tie-break as Rerank.mmr. Cosines
    // use the dot/sqrt(na*nb) kernel so doubles agree bit-for-bit.
    "q_mmr" -> {
      val qv = OracleGen.doubleList(qDense64)
      def cos(a: String, b: String) = OracleGen.denseCosineSql(a, b)
      s"""WITH RECURSIVE cand AS (
         |  SELECT vec_id, round(${cos("CAST(embedding AS DOUBLE[])", qv)}, 6) AS rel,
         |         CAST(embedding AS DOUBLE[]) AS emb
         |  FROM embeddings ORDER BY rel DESC, vec_id ASC LIMIT 50
         |), sel(step, ids, pick_id, pick_rel) AS (
         |  SELECT 1, [vec_id], vec_id, rel
         |  FROM (SELECT * FROM cand ORDER BY rel DESC, vec_id ASC LIMIT 1)
         |  UNION ALL
         |  SELECT s.step + 1, list_append(s.ids, p.vec_id), p.vec_id, p.rel
         |  FROM sel s, LATERAL (
         |    SELECT c.vec_id, c.rel FROM cand c WHERE NOT list_contains(s.ids, c.vec_id)
         |    ORDER BY 0.5 * c.rel - 0.5 * (SELECT max(${cos("c.emb", "c2.emb")})
         |                                  FROM cand c2 WHERE list_contains(s.ids, c2.vec_id)) DESC,
         |             c.vec_id ASC
         |    LIMIT 1) p
         |  WHERE s.step < 10
         |)
         |SELECT pick_id AS doc_id, pick_rel AS score, CAST(step AS INT) AS rank
         |FROM sel ORDER BY step""".stripMargin
    },

    "q_hybrid_l2_geo" -> OracleGen.hybridSql(qTokensA, qTokensB, "l2", "geometric_mean"),
    "q_hybrid_zscore" -> OracleGen.hybridSql(qTokensA, qTokensB, "z_score", "arithmetic_mean"),
    "q_hybrid_weighted" -> OracleGen.hybridSql(qTokensA, qTokensB, "min_max", "arithmetic_mean", Some((0.7, 0.3))),
    "q_hybrid_harmonic" -> OracleGen.hybridSql(qTokensA, qTokensB, "min_max", "harmonic_mean")
  )
}
