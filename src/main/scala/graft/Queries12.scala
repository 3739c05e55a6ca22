package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TrainingData

/** Twelfth bank (round 8, second pass) — the substring-dedup story and
  * corpus-curation widening, all hard-gate oracled:
  *
  *   - winnowing (MOSS) fingerprint pairs, capped variant, overlap
  *     EXTENT (longest common token run; DP vs a gaps-and-islands SQL
  *     oracle), and span EXCISION (the keep-one-copy removal step);
  *   - substring-level decontamination, batch + streaming (AvailableNow
  *     ≡ batch with the same SQL verbatim);
  *   - temperature-scaled corpus mixing (quotas RECOMPUTED independently
  *     by the oracle — sqrt is IEEE-exact, the normalizer folds in
  *     stratum-sorted order), deterministic train/val/test splits;
  *   - Gopher-rules corpus filter (batch + stream gate), token
  *     commonness, per-source profiles, vocabulary, embedding-space
  *     outlier scoring (order-invariant quantized centroids). */
object Queries12 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private[graft] val WinnowK = 4 // tokens per gram
  private[graft] val WinnowW = 4 // winnow window, in grams
  private[graft] val WinnowMinShared = 2
  private[graft] val WinnowCap = 2 // maxDf for the capped variant (binds at sf0.01: df reaches 4)

  private val MixAlpha = 0.5
  private val MixFrac = 0.25

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // winnowing fingerprint pairs: local verbatim-overlap detection (the
    // substring-dedup regime); guarantee = any shared run of w+k-1 = 7
    // tokens produces a shared fingerprint
    "q_dedup_winnow" -> ((s, dir) =>
      Dedup.winnowPairs(t(s, dir, "documents"), k = WinnowK, w = WinnowW,
        minShared = WinnowMinShared)
        .orderBy(col("id_a"), col("id_b"))),

    // the boilerplate-regime lever: fingerprints seen in more than maxDf
    // docs never enter pair generation (corpus-hot = boilerplate, not
    // copied passages) — candidates only from rare shared substrings
    "q_dedup_winnow_capped" -> ((s, dir) =>
      Dedup.winnowPairs(t(s, dir, "documents"), k = WinnowK, w = WinnowW,
        minShared = 1, maxDf = Some(WinnowCap))
        .orderBy(col("id_a"), col("id_b"))),

    // probe-dispatched winnow (the ngramJaccardAuto protocol on the
    // fingerprint side): one df-distribution probe picks uncapped/capped,
    // so the serial-hot-group foot-gun is never the default at scale. The
    // oracle is the EXACT (uncapped) winnow SQL, so the gate asserts the
    // fixture stayed out of the recall-trading capped regime — a testdata
    // regeneration that flips the regime fails loud as a fixture problem,
    // not a silent engine/oracle divergence.
    "q_dedup_winnow_auto" -> ((s, dir) => {
      val (strat, out) = Dedup.winnowPairsAutoWithStrategy(
        t(s, dir, "documents"), k = WinnowK, w = WinnowW,
        minShared = WinnowMinShared)
      require(strat != "capped",
        s"q_dedup_winnow_auto fixture dispatched '$strat' — the gate's " +
          "oracle is exact winnow counts, valid only outside the capped " +
          "regime; the testdata fixture has regenerated into a " +
          "boilerplate-like df distribution (fix the fixture or gate the " +
          "capped oracle explicitly)")
      out.orderBy(col("id_a"), col("id_b"))
    }),

    // overlap EXTENT per winnow pair: the longest shared token run — the
    // quantity substring-dedup policies threshold on
    "q_dedup_substring" -> ((s, dir) =>
      Dedup.winnowPairExtent(t(s, dir, "documents"), k = WinnowK, w = WinnowW,
        minShared = WinnowMinShared)
        .orderBy(col("id_a"), col("id_b"))),

    // substring-level decontamination: train docs (doc_id % 50 <> 0)
    // sharing any winnowed fingerprint with a bench doc — catches a quoted
    // benchmark passage inside a long train doc that whole-doc Jaccard
    // dilutes below threshold
    "q_decontaminate_winnow" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.decontaminateWinnow(
        docs.where(col("doc_id") % 50 =!= 0),
        docs.where(col("doc_id") % 50 === 0),
        k = WinnowK, w = WinnowW, minShared = WinnowMinShared)
        .orderBy(col("train_id"), col("bench_id"))
    }),

    // embedding-space outlier scoring: cosine of every vector against its
    // own label-group centroid (deterministic long-sum quantized centroid)
    "q_embedding_outliers" -> ((s, dir) =>
      TrainingData.embeddingOutliers(t(s, dir, "embeddings"), threshold = 0.0)
        .orderBy(col("vec_id"))),

    // the corpus filter as an INGESTION-TIME gate: gopherFilter is
    // row-local, so it runs stateless on the doc stream (Append mode) and
    // AvailableNow must equal the batch decision table exactly
    "q_stream_filter" -> ((s, dir) =>
      Queries6.runAvailableNow(
        graft.text.TextAnalysis.gopherFilter(Queries6.streamOf(s, dir, "documents")),
        "append")
        .orderBy(col("doc_id"))),

    // deterministic train/val/test assignment (922/51/51 in 1024ths)
    "q_split_assign" -> ((s, dir) =>
      TrainingData.assignSplits(t(s, dir, "documents"))
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))),

    // corpus-relative token commonness (the ln-free perplexity cousin)
    "q_token_commonness" -> ((s, dir) =>
      graft.text.TextAnalysis.commonness(t(s, dir, "documents"))
        .orderBy(col("doc_id"))),

    // per-source corpus profile: counts, exact mean, interpolated p50/p95
    "q_source_stats" -> ((s, dir) =>
      graft.text.TextAnalysis.corpusStats(t(s, dir, "documents"))
        .orderBy(col("source"))),

    // corpus vocabulary: top-100 tokens by total count (+ doc frequency),
    // the BPE-prep / stopword-detection frequency table
    "q_vocab_top" -> ((s, dir) =>
      graft.text.TextAnalysis.vocab(t(s, dir, "documents"), topK = 100)),

    // Gopher-rules corpus filter: keep/drop decision + first-failing-rule
    // reject reason, one row-local projection over the corpus
    "q_corpus_filter" -> ((s, dir) =>
      graft.text.TextAnalysis.gopherFilter(t(s, dir, "documents"))
        .orderBy(col("doc_id"))),

    // the REMOVAL step (substring-dedup policy: keep one copy of the
    // duplicated span): per-pair dry run excising the best shared run
    // from the higher-id doc
    "q_dedup_excise" -> ((s, dir) =>
      Dedup.winnowExcise(t(s, dir, "documents"), k = WinnowK, w = WinnowW,
        minShared = WinnowMinShared)
        .orderBy(col("id_a"), col("id_b"))),

    // streaming form of the substring gate: the train-split doc stream
    // flagged against static bench fingerprints as it lands; AvailableNow
    // must hash-equal the batch bipartite relation (batch parity in the
    // hard gate, same protocol as q_stream_decontaminate)
    "q_stream_decontaminate_winnow" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val stream = Queries6.streamOf(s, dir, "documents")
        .where(col("doc_id") % 50 =!= 0)
      Queries6.runAvailableNow(
        graft.streaming.StreamingDecontaminate.flagStreamWinnow(
          stream, docs.where(col("doc_id") % 50 === 0),
          k = WinnowK, w = WinnowW, minShared = WinnowMinShared),
        "complete")
        .orderBy(col("train_id"), col("bench_id"))
    }),

    // temperature-scaled corpus mixing over the source strata: share of
    // stratum s targets n_s^0.5, total targets 25% of the corpus
    "q_mix_temperature" -> ((s, dir) =>
      TrainingData.temperatureMix(t(s, dir, "documents"), "source",
        alpha = MixAlpha, targetFrac = MixFrac)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id")))
  )

  /** The winnowing pipeline in SQL, up through the per-doc distinct
    * fingerprint set `wn_fp`: unsigned-FNV token hashes in original order
    * -> per-position k-gram Rabin-Karp fold (HUGEINT, mod 2^61-1) ->
    * window starts 1..max(1, t-w+1) -> rightmost-min selection per window
    * (ORDER BY gh ASC, i DESC). Shared by the uncapped and capped pair
    * queries. */
  private lazy val winnowFpCtes: String = {
    val fnvP = OracleGen.fnvSql("p")
    val M = (1L << 61) - 1
    val k = WinnowK
    val w = WinnowW
    s"""wn_parts AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS p,
       |         generate_subscripts(regexp_split_to_array(lower(text), '\\s+'), 1) AS ord
       |  FROM documents
       |), wn_hash AS (
       |  SELECT p, $fnvP AS th FROM (SELECT DISTINCT p FROM wn_parts WHERE p <> '')
       |), wn_list AS (
       |  SELECT f.doc_id, list(h.th ORDER BY f.ord) AS hl
       |  FROM wn_parts f JOIN wn_hash h USING (p)
       |  WHERE f.p <> '' GROUP BY f.doc_id
       |), wn_g AS (
       |  SELECT doc_id, i,
       |         list_reduce(
       |           list_prepend(CAST(0 AS BIGINT), hl[i : i + ${k - 1}]),
       |           (h, th) -> CAST((CAST(h AS HUGEINT) * 31 % $M + th) % $M AS BIGINT)
       |         ) AS gh
       |  FROM (SELECT doc_id, unnest(generate_series(1, len(hl) - ${k - 1})) AS i, hl
       |        FROM wn_list)
       |), wn_n AS (SELECT doc_id, count(*) AS t FROM wn_g GROUP BY doc_id),
       |wn_starts AS (
       |  SELECT doc_id, unnest(generate_series(1, greatest(1, t - ${w - 1}))) AS j
       |  FROM wn_n
       |), wn_win AS (
       |  SELECT s.doc_id, s.j, g.i, g.gh,
       |         row_number() OVER (PARTITION BY s.doc_id, s.j
       |                            ORDER BY g.gh ASC, g.i DESC) AS rn
       |  FROM wn_starts s
       |  JOIN wn_g g ON g.doc_id = s.doc_id AND g.i BETWEEN s.j AND s.j + ${w - 1}
       |), wn_fp AS (SELECT DISTINCT doc_id, gh FROM wn_win WHERE rn = 1)""".stripMargin
  }

  /** Winnow pair candidates + per-pair token-match islands, shared by the
    * extent and excision oracles: ws_pairs (shared-hash pairs at
    * minShared), ws_tk (contiguous re-ranked token positions), ws_m
    * (string-equality match positions), ws_runs (per-diagonal
    * gaps-and-islands with length AND end position). */
  private lazy val winnowMatchCtes: String =
    s"""${winnowFpCtes},
       |ws_pairs AS (
       |  SELECT id_a, id_b, n_shared FROM (
       |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |           CAST(count(*) AS BIGINT) AS n_shared
       |    FROM wn_fp a JOIN wn_fp b ON a.gh = b.gh AND a.doc_id < b.doc_id
       |    GROUP BY 1, 2)
       |  WHERE n_shared >= $WinnowMinShared
       |), ws_tk AS (
       |  SELECT doc_id, p, row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS o
       |  FROM wn_parts WHERE p <> ''
       |), ws_m AS (
       |  SELECT c.id_a, c.id_b, a.o AS i, b.o AS j
       |  FROM ws_pairs c
       |  JOIN ws_tk a ON a.doc_id = c.id_a
       |  JOIN ws_tk b ON b.doc_id = c.id_b AND b.p = a.p
       |), ws_runs AS (
       |  SELECT id_a, id_b, d, grp, count(*) AS rl, max(i) AS i_end
       |  FROM (SELECT id_a, id_b, i - j AS d,
       |               i - row_number() OVER (PARTITION BY id_a, id_b, i - j
       |                                      ORDER BY i) AS grp, i
       |        FROM ws_m)
       |  GROUP BY 1, 2, 3, 4
       |)""".stripMargin

  private lazy val decontWinnowSql: String =
    s"""WITH ${winnowFpCtes},
       |wn_tr AS (SELECT doc_id AS train_id, gh FROM wn_fp WHERE doc_id % 50 <> 0),
       |wn_be AS (SELECT doc_id AS bench_id, gh FROM wn_fp WHERE doc_id % 50 = 0)
       |SELECT train_id, bench_id, n_shared FROM (
       |  SELECT t.train_id, b.bench_id, CAST(count(*) AS BIGINT) AS n_shared
       |  FROM wn_tr t JOIN wn_be b ON t.gh = b.gh
       |  GROUP BY 1, 2)
       |WHERE n_shared >= $WinnowMinShared
       |ORDER BY train_id, bench_id""".stripMargin

  private lazy val corpusFilterSql: String =
        """WITH cf_tk AS (
          |  SELECT doc_id,
          |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS p,
          |         generate_subscripts(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> ''), 1) AS ord
          |  FROM documents
          |), cf_uni AS (
          |  SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS f
          |  FROM (SELECT doc_id, p, count(*) AS c FROM cf_tk GROUP BY 1, 2) GROUP BY doc_id
          |), cf_big0 AS (
          |  SELECT a.doc_id, a.p || ' ' || b.p AS g
          |  FROM cf_tk a JOIN cf_tk b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
          |), cf_big AS (
          |  SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS f
          |  FROM (SELECT doc_id, g, count(*) AS c FROM cf_big0 GROUP BY 1, 2) GROUP BY doc_id
          |), cf_tri0 AS (
          |  SELECT a.doc_id, a.p || ' ' || b.p || ' ' || c.p AS g
          |  FROM cf_tk a
          |  JOIN cf_tk b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
          |  JOIN cf_tk c ON c.doc_id = a.doc_id AND c.ord = a.ord + 2
          |), cf_tri AS (
          |  SELECT doc_id,
          |         round(sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / sum(c), 6) AS f
          |  FROM (SELECT doc_id, g, count(*) AS c FROM cf_tri0 GROUP BY 1, 2) GROUP BY doc_id
          |), cf_len AS (
          |  SELECT doc_id,
          |         len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS nt,
          |         CAST(length(text) AS DOUBLE) AS nc
          |  FROM documents
          |), cf_sig AS (
          |  SELECT l.doc_id, l.nt,
          |         CASE WHEN l.nt > 0 THEN round((l.nc - (l.nt - 1)) / l.nt, 4) ELSE 0.0 END AS mwl,
          |         coalesce(u.f, 0.0) AS uf, coalesce(b.f, 0.0) AS bf, coalesce(t.f, 0.0) AS tf
          |  FROM cf_len l
          |  LEFT JOIN cf_uni u ON u.doc_id = l.doc_id
          |  LEFT JOIN cf_big b ON b.doc_id = l.doc_id
          |  LEFT JOIN cf_tri t ON t.doc_id = l.doc_id
          |)
          |SELECT doc_id, reason = 'ok' AS kept, reason FROM (
          |  SELECT doc_id,
          |         CASE WHEN nt < 20 THEN 'too_short'
          |              WHEN nt > 90 THEN 'too_long'
          |              WHEN mwl > 5.0 THEN 'word_len'
          |              WHEN uf > 0.12 THEN 'repetitive_unigram'
          |              WHEN bf > 0.08 THEN 'repetitive_bigram'
          |              WHEN tf > 0.05 THEN 'repetitive_trigram'
          |              ELSE 'ok' END AS reason
          |  FROM cf_sig)
          |ORDER BY doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_dedup_winnow" ->
      s"""WITH ${winnowFpCtes}
         |SELECT id_a, id_b, n_shared FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         CAST(count(*) AS BIGINT) AS n_shared
         |  FROM wn_fp a JOIN wn_fp b ON a.gh = b.gh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |WHERE n_shared >= $WinnowMinShared
         |ORDER BY id_a, id_b""".stripMargin,

    // auto gate: the probe dispatches uncapped on this fixture (asserted
    // engine-side), so the oracle is the exact winnow SQL verbatim
    "q_dedup_winnow_auto" ->
      s"""WITH ${winnowFpCtes}
         |SELECT id_a, id_b, n_shared FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         CAST(count(*) AS BIGINT) AS n_shared
         |  FROM wn_fp a JOIN wn_fp b ON a.gh = b.gh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |WHERE n_shared >= $WinnowMinShared
         |ORDER BY id_a, id_b""".stripMargin,

    // same fingerprint chain; hashes with df > cap are excluded from pair
    // generation entirely
    "q_dedup_winnow_capped" ->
      s"""WITH ${winnowFpCtes},
         |wn_df AS (SELECT gh FROM (SELECT gh, count(*) AS df FROM wn_fp GROUP BY gh)
         |          WHERE df <= $WinnowCap),
         |wn_fpc AS (SELECT f.doc_id, f.gh FROM wn_fp f JOIN wn_df USING (gh))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(count(*) AS BIGINT) AS n_shared
         |FROM wn_fpc a JOIN wn_fpc b ON a.gh = b.gh AND a.doc_id < b.doc_id
         |GROUP BY 1, 2
         |ORDER BY id_a, id_b""".stripMargin,

    // longest common token run per winnow pair, relationally: token-match
    // positions (i, j) per pair -> per-diagonal (i-j) gaps-and-islands on
    // consecutive i -> max island size. Identical by definition to the
    // engine's O(n·m) DP (same string-equality matches).
    "q_dedup_substring" ->
      s"""WITH ${winnowMatchCtes}
         |SELECT p.id_a, p.id_b, p.n_shared,
         |       CAST(coalesce(max(r.rl), 0) AS INT) AS max_run
         |FROM ws_pairs p LEFT JOIN ws_runs r ON r.id_a = p.id_a AND r.id_b = p.id_b
         |GROUP BY 1, 2, 3
         |ORDER BY p.id_a, p.id_b""".stripMargin,

    // the removal step: rank the islands exactly the way the DP scan picks
    // its winner (rl DESC, i_end ASC, j_end ASC = first scan-order cell
    // reaching max length), then rebuild id_b's text without the tokens
    // in [j_end - rl + 1, j_end]
    "q_dedup_excise" ->
      s"""WITH ${winnowMatchCtes},
         |ws_best AS (
         |  SELECT id_a, id_b, rl, i_end - d AS j_end FROM (
         |    SELECT id_a, id_b, d, rl, i_end,
         |           row_number() OVER (PARTITION BY id_a, id_b
         |                              ORDER BY rl DESC, i_end ASC, i_end - d ASC) AS rn
         |    FROM ws_runs)
         |  WHERE rn = 1
         |), ws_exc AS (
         |  SELECT b.id_a, b.id_b, b.rl,
         |         coalesce(string_agg(t.p, ' ' ORDER BY t.o), '') AS text_b_clean
         |  FROM ws_best b
         |  LEFT JOIN ws_tk t ON t.doc_id = b.id_b
         |    AND NOT (t.o BETWEEN b.j_end - b.rl + 1 AND b.j_end)
         |  GROUP BY 1, 2, 3
         |)
         |SELECT p.id_a, p.id_b,
         |       CAST(coalesce(e.rl, 0) AS INT) AS run_len,
         |       coalesce(e.text_b_clean, tb.full_text) AS text_b_clean
         |FROM ws_pairs p
         |LEFT JOIN ws_exc e ON e.id_a = p.id_a AND e.id_b = p.id_b
         |LEFT JOIN (SELECT doc_id, string_agg(p, ' ' ORDER BY o) AS full_text
         |           FROM ws_tk GROUP BY doc_id) tb ON tb.doc_id = p.id_b
         |ORDER BY p.id_a, p.id_b""".stripMargin,

    // bipartite winnow fingerprint join, split by the bench predicate;
    // shared verbatim by the batch and streaming forms — identical output
    // is the batch-parity claim
    "q_decontaminate_winnow" -> decontWinnowSql,
    "q_stream_decontaminate_winnow" -> decontWinnowSql,

    // centroid recomputed with the same order-independent arithmetic: the
    // long sums are exact, the double divisions are left-associated
    // identically, and the per-vector cosine is the same list-order fold
    // dense_dot executes
    "q_embedding_outliers" -> {
      val q = graft.text.TrainingData.CentroidQ.toDouble
      val dotVC = OracleGen.denseDotSql("CAST(e.embedding AS DOUBLE[])", "c.cent")
      val dotVV = OracleGen.denseDotSql("CAST(e.embedding AS DOUBLE[])",
        "CAST(e.embedding AS DOUBLE[])")
      val dotCC = OracleGen.denseDotSql("c.cent", "c.cent")
      s"""WITH eo_x AS (
         |  SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
         |         generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS i
         |  FROM embeddings
         |), eo_s AS (
         |  SELECT label, i, sum(CAST(floor(v * $q) AS BIGINT)) AS s, count(*) AS n
         |  FROM eo_x GROUP BY 1, 2
         |), eo_c AS (
         |  SELECT label,
         |         list(CAST(CAST(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / $q AS REAL) AS DOUBLE)
         |              ORDER BY i) AS cent
         |  FROM eo_s GROUP BY label
         |), scored AS (
         |  SELECT e.vec_id, e.label,
         |         round(CASE WHEN sqrt($dotVV) = 0.0 OR sqrt($dotCC) = 0.0 THEN 0.0
         |                    ELSE $dotVC / (sqrt($dotVV) * sqrt($dotCC)) END, 6) AS centroid_cos
         |  FROM embeddings e JOIN eo_c c USING (label)
         |)
         |SELECT vec_id, label, centroid_cos, centroid_cos < 0.0 AS is_outlier
         |FROM scored ORDER BY vec_id""".stripMargin
    },

    // identical FNV bucket, cut points in 1024ths
    "q_split_assign" -> {
      val fnvId = OracleGen.fnvSql("('split:' || CAST(doc_id AS VARCHAR))")
      s"""SELECT doc_id,
         |       CASE WHEN ($fnvId) % 1024 < 922 THEN 'train'
         |            WHEN ($fnvId) % 1024 < 973 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    // exact integer sums; ONE double division with the same association
    "q_token_commonness" ->
      """WITH tc_tk AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents
        |), tc_cnt AS (SELECT token, count(*) AS c FROM tc_tk GROUP BY token),
        |tc_tot AS (SELECT sum(c) AS t FROM tc_cnt)
        |SELECT doc_id, CAST(count(*) AS INT) AS n_tokens,
        |       round(CAST(sum(c) AS DOUBLE) /
        |             (CAST(count(*) AS DOUBLE) * CAST(t AS DOUBLE)), 8) AS mean_token_freq
        |FROM tc_tk JOIN tc_cnt USING (token) CROSS JOIN tc_tot
        |GROUP BY doc_id, t ORDER BY doc_id""".stripMargin,

    // integer sums divide exactly; quantile_cont implements the same
    // (n-1)p linear interpolation as Spark's exact percentile; 4dp
    // rounding absorbs any last-ulp interpolation divergence
    "q_source_stats" ->
      """SELECT source,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS mean_chars,
        |       round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
        |       round(quantile_cont(n_chars, 0.95), 4) AS p95_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q_vocab_top" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |FROM (SELECT doc_id,
        |             unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
        |      FROM documents)
        |GROUP BY token
        |ORDER BY cnt DESC, token ASC
        |LIMIT 100""".stripMargin,

    // the repetition-CTE chain + length signals, then the same first-fail
    // CASE chain over the identical rounded doubles; shared verbatim by
    // the batch and streaming forms (AvailableNow == batch is the claim)
    "q_corpus_filter" -> corpusFilterSql,
    "q_stream_filter" -> corpusFilterSql,

    // quotas recomputed in SQL with bit-identical arithmetic: counts are
    // exact integer doubles, sqrt is correctly rounded IEEE-754 on both
    // engines, the normalizer z folds in source-sorted order with the same
    // association as the Scala foldLeft, and every * / is left-associated
    // identically — floor(least(1,p)*1024) lands on the same integer
    "q_mix_temperature" -> {
      val fnvId = OracleGen.fnvSql("('doc:' || CAST(doc_id AS VARCHAR))")
      s"""WITH mx_cnt AS (
         |  SELECT source, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY source
         |), mx_tot AS (SELECT sum(n) AS total FROM mx_cnt),
         |mx_z AS (
         |  SELECT list_reduce(
         |           list_prepend(CAST(0.0 AS DOUBLE), list(sqrt(n) ORDER BY source)),
         |           (a, b) -> a + b) AS z
         |  FROM mx_cnt
         |), mx_q AS (
         |  SELECT source,
         |         CAST(floor(least(1.0, $MixFrac * total * sqrt(n) / z / n) * ${TrainingData.SampleMod}) AS BIGINT) AS quota
         |  FROM mx_cnt CROSS JOIN mx_tot CROSS JOIN mx_z
         |)
         |SELECT d.doc_id, d.source
         |FROM documents d JOIN mx_q q USING (source)
         |WHERE ($fnvId) % ${TrainingData.SampleMod} < q.quota
         |ORDER BY d.doc_id""".stripMargin
    }
  )
}
