package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PruneUtils
import graft.ingest.Enrich
import graft.sparse.SparseRetrieval

/** Tenth bank (round 8): hard-gate coverage for operators that were
  * previously unit-test-only — max_chunk_limit truncation semantics
  * (reference Chunker.java:67-69), the four prune strategies as a direct
  * corpus query (PruneUtils.java), and approximate_threshold strategy
  * dispatch (exact vs SEISMIC, NeuralSparseQueryBuilder's ANN cutover). */
object Queries10 {

  import SparkEntry.{docsWithTokens, qTokensB}

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** (strategy, ratio) grid for q_prune. abs_value 1.5 sits in the gap
    * between weight 1.0 (count 1) and 1.693 (count 2), so the float
    * boundary can never be close; top_k ties break on (-w, token asc) in
    * BOTH engines. */
  private val PruneGrid: Seq[(String, Float)] = Seq(
    ("abs_value", 1.5f), ("alpha_mass", 0.8f), ("max_ratio", 0.4f), ("top_k", 5f))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // max_chunk_limit: limit 3 — when chunks_so_far + chunk_string_count
    // >= limit, the ENTIRE remaining text becomes the final chunk
    // (passthrough truncation, not a drop)
    "q_chunk_limit" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(Enrich.chunkFixedTokenUdf(8, 0.25, 3)(col("text"))).as(Seq("idx", "chunk")))
        .orderBy(col("doc_id"), col("idx"))),

    // the 4 prune strategies applied to every doc's sparse vector:
    // kept-count + kept-mass per (doc, strategy) — the split() contract
    // as a corpus-wide relational result
    "q_prune" -> ((s, dir) => {
      val pruneUdf = udf((tokens: Map[String, Float], strat: String, ratio: Float) => {
        val (kept, _) = PruneUtils.split(tokens, PruneUtils.pruneType(strat), ratio)
        (kept.size, kept.valuesIterator.map(_.toDouble).sum)
      })
      val grid = PruneGrid.map { case (n, r) => struct(lit(n).as("strategy"), lit(r).as("ratio")) }
      docsWithTokens(s, dir)
        .select(col("doc_id"), col("tokens"), explode(array(grid: _*)).as("g"))
        .select(col("doc_id"), col("g.strategy").as("strategy"),
          pruneUdf(col("tokens"), col("g.strategy"), col("g.ratio")).as("p"))
        .select(col("doc_id"), col("strategy"),
          col("p._1").as("n_kept"), round(col("p._2"), 6).as("kept_mass"))
        .orderBy(col("doc_id"), col("strategy"))
    }),

    // approximate_threshold dispatch, ANN side: corpus count >= threshold
    // → SEISMIC search (ingest-memo index, search defaults top_n=10,
    // heap_factor=1.0)
    "q_sparse_auto" -> ((s, dir) => {
      val docs = docsWithTokens(s, dir)
      SparseRetrieval.autoTopK(docs, qTokensB, k = 10, approximateThreshold = 100L,
        index = Some(SparkEntry.seismicTruncIndex(s, dir)))
    }),

    // approximate_threshold dispatch, exact side: threshold above the corpus
    // count → linear exact scoring, no index touched
    "q_sparse_auto_exact" -> ((s, dir) => {
      val docs = docsWithTokens(s, dir)
      SparseRetrieval.autoTopK(docs, qTokensB, k = 10,
        approximateThreshold = Long.MaxValue)
    })
  )

  def oracleSql: Map[String, String] = Map(
    // fixed_token limit-3 semantics on the single-space corpus: chunk 0 =
    // tokens [1..8]+' ' (whole doc when n<=8); chunk 1 exists iff n>8 and is
    // final (runs to end) iff n<=14; chunk 2 exists iff n>14 and is ALWAYS
    // the passthrough remainder tokens [13..n]
    "q_chunk_limit" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk, len(string_split(text, ' ')) AS n
        |  FROM documents
        |)
        |SELECT doc_id, idx, chunk FROM (
        |  SELECT doc_id, 0 AS idx,
        |         CASE WHEN n <= 8 THEN array_to_string(tk[1:n], ' ')
        |              ELSE array_to_string(tk[1:8], ' ') || ' ' END AS chunk
        |  FROM toks
        |  UNION ALL
        |  SELECT doc_id, 1,
        |         CASE WHEN n <= 14 THEN array_to_string(tk[7:n], ' ')
        |              ELSE array_to_string(tk[7:14], ' ') || ' ' END
        |  FROM toks WHERE n > 8
        |  UNION ALL
        |  SELECT doc_id, 2, array_to_string(tk[13:n], ' ')
        |  FROM toks WHERE n > 14
        |)
        |ORDER BY doc_id, idx""".stripMargin,

    // per-strategy keep predicates over a shared ranked CTE, rank ordered
    // (w DESC, t ASC) like PruneUtils.split. alpha_mass replicates the
    // engine's FLOAT accumulation exactly via a recursive rank-stepped
    // prefix: double-add of two floats is exact (24+24 < 53 mantissa bits),
    // so CAST(pfx + w AS REAL) IS the IEEE float add `topSum += w`; the
    // total is the double prefix at rk = n cast to REAL, exactly
    // `sorted.map(_._2.toDouble).sum.toFloat`
    "q_prune" ->
      s"""WITH RECURSIVE ${OracleGen.docVectorsCte},
        |ranked AS (
        |  SELECT doc_id, t, w,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, t ASC) AS rk,
        |         count(*) OVER (PARTITION BY doc_id) AS n,
        |         max(w) OVER (PARTITION BY doc_id) AS mx
        |  FROM dv
        |), acc AS (
        |  SELECT doc_id, rk, n, CAST(w AS REAL) AS pfx, CAST(w AS DOUBLE) AS pfxd
        |  FROM ranked WHERE rk = 1
        |  UNION ALL
        |  SELECT r.doc_id, r.rk, r.n, CAST(a.pfx + r.w AS REAL), a.pfxd + CAST(r.w AS DOUBLE)
        |  FROM acc a JOIN ranked r ON r.doc_id = a.doc_id AND r.rk = a.rk + 1
        |), tot AS (
        |  SELECT doc_id, CAST(pfxd AS REAL) AS totf FROM acc WHERE rk = n
        |), marked AS (
        |  SELECT doc_id, w, 'abs_value' AS strategy, (w >= 1.5) AS keep FROM ranked
        |  UNION ALL
        |  SELECT r.doc_id, r.w, 'alpha_mass',
        |         (a.pfx <= CAST(0.8 AS REAL) * tot.totf)
        |  FROM ranked r
        |  JOIN acc a ON a.doc_id = r.doc_id AND a.rk = r.rk
        |  JOIN tot ON tot.doc_id = r.doc_id
        |  UNION ALL
        |  SELECT doc_id, w, 'max_ratio', (w >= CAST(0.4 AS REAL) * mx) FROM ranked
        |  UNION ALL
        |  SELECT doc_id, w, 'top_k', (rk <= 5) FROM ranked
        |)
        |SELECT doc_id, strategy,
        |       CAST(count(*) FILTER (WHERE keep) AS INT) AS n_kept,
        |       round(coalesce(sum(CAST(w AS DOUBLE)) FILTER (WHERE keep), 0.0), 6) AS kept_mass
        |FROM marked GROUP BY doc_id, strategy
        |ORDER BY doc_id, strategy""".stripMargin,

    // ANN side ≡ the SEISMIC pruned-search oracle at search defaults
    "q_sparse_auto" -> OracleGen.seismicSql(qTokensB,
      nPostings = SparkEntry.SeismicTruncNPostings, k = 10, topN = 10,
      heapFactor = 1.0f),

    // exact side ≡ the linear sparse-dot oracle
    "q_sparse_auto_exact" ->
      s"""WITH ${OracleGen.docVectorsCte},
         |scores AS (${OracleGen.sparseScoreSql(OracleGen.valuesOf(qTokensB))})
         |SELECT doc_id, score FROM scores
         |WHERE score > 0.0
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin
  )
}
