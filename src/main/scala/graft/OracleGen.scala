package graft

import graft.model._

/** Shared DuckDB-oracle SQL generators. Every generator takes the SAME
  * Scala constants the Spark queries use (query token maps, weights,
  * thresholds), so the two sides cannot drift. All ranking is done on
  * scores rounded to 6 decimals (matching the Spark side) with doc_id
  * tie-breaks — see .claude/skills/verify/SKILL.md for the determinism
  * protocol.
  */
private[graft] object OracleGen {

  /** Float literal that DuckDB parses back to the identical float. */
  def f32(w: Float): String = s"CAST(${w.toString} AS REAL)"

  /** Double literal carrying a float's exact double value (Float.toString
    * re-parsed as DOUBLE would differ in the last ulps; Double.toString of
    * the widened value round-trips exactly). */
  def f64(w: Float): String = w.toDouble.toString

  def doubleList(v: Array[Float]): String =
    v.map(f64).mkString("[", ", ", "]")

  /** FNV-1a 32-bit over an (ASCII) string SQL expression — bit-exact
    * HashEmbedder.tokenHash as unsigned BIGINT. list_filter drops the ''
    * artifact string_split('','') produces for empty input (reduce then
    * returns the unmodified 2166136261 basis, matching the Scala loop). */
  def fnvSql(strExpr: String): String =
    s"""list_reduce(list_prepend(CAST(2166136261 AS BIGINT),
       |  list_transform(list_filter(string_split($strExpr, ''), ch -> ch <> ''),
       |                 ch -> CAST(unicode(ch) AS BIGINT))),
       |  (h, ch) -> ((xor(h, ch) * 16777619) % 4294967296))""".stripMargin

  /** documents → (doc_id, v DOUBLE[dim]) dense hash embeddings — bit-exact
    * HashEmbedder.embed: idx = fnv(t) mod dim (dim divides 2^32 so unsigned
    * mod ≡ Java floorMod of the signed hash), count per idx, L2-normalized
    * with a per-component float cast. Names are prefixed e_ to compose with
    * the sparse docVectorsCte in one WITH. */
  def embedCte(dim: Int, textExpr: String = "text", p: String = "e_"): String =
    s"""${p}tok AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower($textExpr), '\\s+')) AS t
       |  FROM documents
       |), ${p}cnt AS (
       |  SELECT doc_id, t, count(*) AS c FROM ${p}tok WHERE t <> '' GROUP BY doc_id, t
       |), ${p}hash AS (
       |  SELECT t, ${fnvSql("t")} % $dim AS idx FROM (SELECT DISTINCT t FROM ${p}cnt)
       |), ${p}idx AS (
       |  SELECT doc_id, idx, CAST(sum(c) AS DOUBLE) AS c
       |  FROM ${p}cnt JOIN ${p}hash USING (t) GROUP BY doc_id, idx
       |), ${p}vec AS (
       |  SELECT d.doc_id, list(coalesce(e.c, 0.0) ORDER BY g.i) AS cnts
       |  FROM (SELECT DISTINCT doc_id FROM documents) d
       |  CROSS JOIN (SELECT unnest(range(0, $dim)) AS i) g
       |  LEFT JOIN ${p}idx e ON e.doc_id = d.doc_id AND e.idx = g.i
       |  GROUP BY d.doc_id
       |), ${p}emb AS (
       |  SELECT doc_id,
       |         CASE WHEN nrm > 0
       |              THEN list_transform(cnts, x -> CAST(CAST(x / nrm AS REAL) AS DOUBLE))
       |              ELSE cnts END AS v
       |  FROM (SELECT doc_id, cnts,
       |               sqrt(list_sum(list_transform(cnts, x -> x * x))) AS nrm
       |        FROM ${p}vec)
       |)""".stripMargin

  /** dense_cosine over two DOUBLE[] SQL expressions: dot/sqrt(na*nb), 0.0
    * on zero norms — the VectorExpressions.DenseCosine kernel. */
  def denseCosineSql(a: String, b: String): String =
    s"""(CASE WHEN list_sum(list_transform($a, x -> x * x)) = 0.0
       |       OR list_sum(list_transform($b, x -> x * x)) = 0.0 THEN 0.0
       |      ELSE list_sum(list_transform(list_zip($a, $b), p -> p[1] * p[2]))
       |           / sqrt(list_sum(list_transform($a, x -> x * x))
       |                  * list_sum(list_transform($b, x -> x * x))) END)""".stripMargin

  /** Plain dot product of two DOUBLE[] expressions. */
  def denseDotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> p[1] * p[2]))"

  /** documents → (doc_id, s) DISTINCT word n-gram shingles — bit-exact
    * Dedup.shingles: tokenize = lower + split \s+ + drop empties; docs with
    * fewer than n tokens fall back to the whole token list joined (the
    * reference Scala's `Set(toks.mkString(" "))`), and token-less docs get
    * the empty-string shingle. Emits a fixed `sh_tok` helper CTE plus the
    * named shingle CTE — use once per statement. */
  def shingleCte(n: Int, name: String): String = {
    val toks = """list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')"""
    val aliases = (0 until n).map(i => s"g$i")
    val joins = aliases.tail.zipWithIndex.map { case (al, i) =>
      s"JOIN sh_tok $al ON $al.doc_id = g0.doc_id AND $al.ord = g0.ord + ${i + 1}"
    }.mkString("\n  ")
    val concat = aliases.map(_ + ".p").mkString(" || ' ' || ")
    s"""sh_tok AS (
       |  SELECT doc_id, unnest($toks) AS p, generate_subscripts($toks, 1) AS ord
       |  FROM documents
       |), $name AS (
       |  SELECT DISTINCT g0.doc_id, $concat AS s
       |  FROM sh_tok g0
       |  $joins
       |  UNION
       |  SELECT doc_id, string_agg(p, ' ' ORDER BY ord) AS s
       |  FROM sh_tok GROUP BY doc_id HAVING count(*) < $n
       |  UNION
       |  SELECT d.doc_id, '' AS s FROM documents d
       |  WHERE NOT EXISTS (SELECT 1 FROM sh_tok t WHERE t.doc_id = d.doc_id)
       |)""".stripMargin
  }

  /** Cosine from precomputed norms: dot/(‖a‖·‖b‖), 0.0 on a zero norm —
    * mirrors the hoisted-norm pair kernels in Dedup (NOT dense_cosine's
    * dot/sqrt(na·nb), which differs in the last ulp). `na`/`nb` are SQL
    * expressions for the two vector norms. */
  def cosineFromNormsSql(a: String, b: String, na: String, nb: String): String =
    s"""(CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 0.0
       |      ELSE ${denseDotSql(a, b)} / ($na * $nb) END)""".stripMargin

  /** Dense (neural) subquery score SELECT against e_emb (embedCte must be
    * in the preamble): round-6 cosine vs the literal query embedding,
    * null-guard >0 as the Spark score column does. */
  def denseScoreSql(qEmb: Array[Float]): String = {
    val q = doubleList(qEmb)
    s"""SELECT doc_id, score FROM (
       |  SELECT doc_id, round(${denseCosineSql("v", q)}, 6) AS score
       |  FROM e_emb) WHERE score > 0.0""".stripMargin
  }

  def valuesOf(m: Map[String, Float]): String =
    m.toSeq.sortBy(_._1).map { case (tk, w) => s"('$tk', ${f32(w)})" }.mkString(", ")

  /** documents → (doc_id, t, w) sparse vectors: HashEmbedder.encode in SQL. */
  val docVectorsCte: String =
    """tok AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS t
      |  FROM documents
      |), dv AS (
      |  SELECT doc_id, t, CAST(1.0 + ln(1.0 + count(*)) AS REAL) AS w
      |  FROM tok WHERE t <> '' GROUP BY doc_id, t
      |)""".stripMargin

  def sparseScoreSql(qValues: String): String =
    s"""SELECT dv.doc_id,
       |       round(sum(CAST(dv.w AS DOUBLE) * CAST(q.qw AS DOUBLE)), 6) AS score
       |FROM dv JOIN (VALUES $qValues) AS q(t, qw) USING (t)
       |GROUP BY dv.doc_id""".stripMargin

  /** SEISMIC pruned-search oracle, valid when the index was built with
    * `nPostings < Seismic.MinClusterSize` (λ-truncated postings → every
    * token's posting list is a SINGLE cluster, so the build contains no
    * seeded randomness and the whole pipeline is SQL-expressible):
    * quantized postings (ingest ceiling 3.0, byte quantizer float steps
    * replicated — DuckDB REAL arithmetic is float32), top-λ truncation,
    * token-wise-max summaries with α-mass prefix pruning, summary scores
    * against the search-quantized query cut, θ = k-th exact seed score,
    * cluster pruning at θ/heap_factor, exact rescore of survivors.
    * Mirrors graft.seismic.Seismic.{build,search} step for step. */
  def seismicSql(q: Map[String, Float], nPostings: Int, k: Int, topN: Int,
      heapFactor: Float, basePredicate: String = "TRUE",
      deltaPredicate: Option[String] = None): String = {
    import graft.seismic.Seismic
    require(nPostings > 0 && nPostings < Seismic.MinClusterSize,
      "oracle form requires single-cluster (λ < min cluster size) builds")
    require(heapFactor > 0f && heapFactor.isFinite,
      "oracle form requires a finite positive heap_factor (∞ has no SQL literal; use the exact path)")
    val cut = q.toSeq.sortBy { case (t, w) => (-w, t) }.take(topN).toMap
    val cutQuantized = cut.map { case (t, w) =>
      t -> Seismic.dequantize(Seismic.quantize(w, Seismic.CeilSearch), Seismic.CeilSearch)
    }
    val cutValues = valuesOf(cutQuantized)
    val fullValues = valuesOf(q)
    val alpha = f64(Seismic.DefaultSummaryPruneRatio)
    val hf = f64(heapFactor)
    // float-exact byte quantizer (clamp [0, ceil] as ByteQuantizer does —
    // the lower clamp is unreachable for 1+ln(1+tf) weights but kept for
    // step-for-step fidelity): REAL ops stay float32 in DuckDB
    val quant =
      """CAST(round(CAST(greatest(CAST(0.0 AS REAL), least(w, CAST(3.0 AS REAL))) AS REAL)
        |     * CAST(255.0 AS REAL) / CAST(3.0 AS REAL)) AS INT)""".stripMargin
    val dequant = // mq INT → float steps of dequantize(mq, CeilIngest)
      """CAST(CAST(mq AS REAL) * CAST(3.0 AS REAL) / CAST(255.0 AS REAL) AS DOUBLE)"""
    s"""WITH $docVectorsCte,
       |qp AS (
       |  SELECT doc_id, t, $quant AS q FROM dv
       |),
       |members AS (
       |  SELECT token, doc_id FROM (
       |    SELECT t AS token, doc_id,
       |           row_number() OVER (PARTITION BY t ORDER BY q DESC, doc_id ASC) AS rn
       |    FROM qp WHERE $basePredicate) WHERE rn <= $nPostings
       |),
       |summ AS (
       |  SELECT m.token, p.t, max(p.q) AS mq
       |  FROM members m JOIN qp p USING (doc_id)
       |  GROUP BY m.token, p.t
       |),
       |spruned AS (
       |  SELECT token, t, mq FROM (
       |    SELECT token, t, mq,
       |           sum(mq) OVER (PARTITION BY token ORDER BY mq DESC, t ASC
       |                         ROWS UNBOUNDED PRECEDING) - mq AS prior,
       |           floor(sum(mq) OVER (PARTITION BY token) * $alpha) AS thr
       |    FROM summ) WHERE prior <= thr
       |),
       |cutq(t, qw) AS (VALUES $cutValues),
       |ctoks AS (SELECT DISTINCT m.token FROM members m JOIN cutq c ON c.t = m.token),
       |ov AS (
       |  SELECT s.token, sum($dequant * CAST(c.qw AS DOUBLE)) AS s
       |  FROM spruned s JOIN cutq c ON c.t = s.t GROUP BY s.token
       |),
       |sscore AS (
       |  SELECT ct.token, round(coalesce(ov.s, 0.0), 6) AS sc
       |  FROM ctoks ct LEFT JOIN ov ON ov.token = ct.token
       |),
       |seedd AS (SELECT DISTINCT m.doc_id FROM members m JOIN ctoks USING (token)),
       |sexact AS (
       |  SELECT dv.doc_id, round(sum(CAST(dv.w AS DOUBLE) * CAST(fq.qw AS DOUBLE)), 6) AS score
       |  FROM dv JOIN (VALUES $fullValues) AS fq(t, qw) ON fq.t = dv.t
       |  JOIN seedd USING (doc_id) GROUP BY dv.doc_id
       |),
       |theta AS (
       |  SELECT CASE WHEN count(*) < $k THEN 0.0 ELSE min(score) END AS th
       |  FROM (SELECT score FROM sexact ORDER BY score DESC LIMIT $k)
       |),
       |kept AS (SELECT s.token FROM sscore s, theta WHERE s.sc >= theta.th / $hf),
       |cand AS (SELECT DISTINCT doc_id FROM (
       |  SELECT m.doc_id FROM members m JOIN kept USING (token)
       |  UNION ALL SELECT doc_id FROM seedd)),
       |fexact AS (
       |  SELECT dv.doc_id, round(sum(CAST(dv.w AS DOUBLE) * CAST(fq.qw AS DOUBLE)), 6) AS score
       |  FROM dv JOIN (VALUES $fullValues) AS fq(t, qw) ON fq.t = dv.t
       |  JOIN cand USING (doc_id) GROUP BY dv.doc_id
       |)
       |${deltaPredicate.fold("") { dp =>
            s""",dexact AS (
               |  SELECT dv.doc_id, round(sum(CAST(dv.w AS DOUBLE) * CAST(fq.qw AS DOUBLE)), 6) AS score
               |  FROM dv JOIN (VALUES $fullValues) AS fq(t, qw) ON fq.t = dv.t
               |  WHERE $dp GROUP BY dv.doc_id
               |)""".stripMargin
          }}
       |SELECT doc_id, score FROM (
       |  SELECT doc_id, score FROM fexact WHERE score > 0.0
       |${deltaPredicate.fold("")(_ => "  UNION ALL SELECT doc_id, score FROM dexact WHERE score > 0.0")}
       |)
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** Full hybrid pipeline oracle: two sparse subqueries (A, B), per-subquery
    * top-K, normalization, combination (with skip semantics), optional
    * collapse, pagination. */
  def hybridSql(
      qA: Map[String, Float],
      qB: Map[String, Float],
      norm: String,
      comb: String,
      weights: Option[(Double, Double)] = None,
      k: Int = 100,
      from: Int = 0,
      size: Int = 10,
      collapse: Option[(String, Int)] = None): String =
    hybridSqlN(Seq(qA, qB), norm, comb,
      weights.map { case (a, b) => Seq(a, b) }, k, from, size, collapse)

  /** N-subquery generalization (≤5 per the hybrid validation table). */
  def hybridSqlN(
      qs: Seq[Map[String, Float]],
      norm: String,
      comb: String,
      weightsN: Option[Seq[Double]] = None,
      k: Int = 100,
      from: Int = 0,
      size: Int = 10,
      collapse: Option[(String, Int)] = None): String =
    hybridFromScores(qs.map(q => sparseScoreSql(valuesOf(q))), norm, comb,
      weightsN, k, from, size, collapse)

  /** Fully general hybrid oracle: each element of `scoreSqls` is a SELECT
    * producing (doc_id, score) for one subquery (already >0-filtered where
    * the Spark side null-guards), `preamble` carries the shared CTEs the
    * score SELECTs reference (sparse doc vectors, hash embeddings, ...).
    *
    * `subqueryCollapse` = (documents key column, docsPerGroup): collapse
    * each SUBQUERY's matches per key before the K-cut (the
    * HybridCollapsingTopDocsCollector per-subquery semantics).
    * `postFilterWhere`: condition over `documents d` applied to the
    * combined result AFTER normalization/combination (post_filter — does
    * not change normalization statistics). */
  /** The shared prefix of every hybrid oracle: preamble + per-subquery
    * score/K-cut CTEs + normalization CTEs + the `comb` CTE. Callers append
    * their own result shaping (ranked top-k, collapse, inner hits) after
    * `comb` — no string surgery on generated SQL. */
  def hybridCombChain(
      scoreSqls: Seq[String],
      norm: String,
      comb: String,
      weightsN: Option[Seq[Double]] = None,
      k: Int = 100,
      preamble: String = docVectorsCte,
      subqueryCollapse: Option[(String, Int)] = None): String = {
    val qs = scoreSqls
    def subq(name: String, scoreSql: String): String = {
      val kSrc = subqueryCollapse match {
        case Some((keyCol, perGroup)) =>
          s"""(SELECT doc_id, score FROM (
             |    SELECT s.doc_id, s.score,
             |           row_number() OVER (PARTITION BY d.$keyCol
             |                ORDER BY s.score DESC, s.doc_id ASC) AS gr
             |    FROM s_$name s JOIN documents d USING (doc_id)) WHERE gr <= $perGroup)""".stripMargin
        case None => s"s_$name"
      }
      s"""s_$name AS ($scoreSql),
         |k_$name AS (
         |  SELECT doc_id, score FROM (
         |    SELECT doc_id, score,
         |           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
         |    FROM $kSrc) WHERE rn <= $k
         |)""".stripMargin
    }
    def normCte(name: String): String = norm match {
      case "min_max" =>
        // float-cast predicates mirror Normalization.minMax (and the
        // reference's float arithmetic): the floor fires iff the float
        // subtraction s_f - mn_f is zero
        s"""SELECT doc_id,
           |       CASE WHEN CAST(mx AS REAL) = CAST(mn AS REAL)
           |                  AND CAST(mx AS REAL) = CAST(score AS REAL) THEN 1.0
           |            WHEN CAST(score AS REAL) = CAST(mn AS REAL) THEN 0.001
           |            ELSE (score - mn) / (mx - mn) END AS nscore
           |FROM (SELECT doc_id, score,
           |             min(score) OVER () AS mn, max(score) OVER () AS mx
           |      FROM k_$name)""".stripMargin
      case "l2" =>
        s"""SELECT doc_id,
           |       CASE WHEN nrm = 0.0 THEN 0.0 ELSE score / nrm END AS nscore
           |FROM (SELECT doc_id, score, sqrt(sum(score * score) OVER ()) AS nrm
           |      FROM k_$name)""".stripMargin
      case "z_score" =>
        // float-cast predicates mirror the reference's Floats.compare (and
        // the Spark side's .cast("float") comparisons)
        s"""SELECT doc_id,
           |       CASE WHEN CAST(score AS REAL) = CAST(mean AS REAL) THEN mx
           |            WHEN sd IS NULL OR CAST(sd AS REAL) = CAST(0.0 AS REAL) THEN mn
           |            WHEN (score - mean) / sd <= 0.0 THEN 0.001
           |            ELSE (score - mean) / sd END AS nscore
           |FROM (SELECT doc_id, score, avg(score) OVER () AS mean,
           |             stddev_samp(score) OVER () AS sd,
           |             max(score) OVER () AS mx, min(score) OVER () AS mn
           |      FROM k_$name)""".stripMargin
      case "rrf" =>
        s"""SELECT doc_id,
           |       1.0 / (60 + row_number() OVER (ORDER BY score DESC, doc_id ASC)) AS nscore
           |FROM k_$name""".stripMargin
    }
    val ws = weightsN.getOrElse(Seq.fill(qs.size)(1.0))
    val combine = comb match {
      case "arithmetic_mean" =>
        """CASE WHEN coalesce(sum(CASE WHEN nscore >= 0 THEN w END), 0.0) = 0.0 THEN 0.0
          |     ELSE sum(CASE WHEN nscore >= 0 THEN w * nscore END)
          |          / sum(CASE WHEN nscore >= 0 THEN w END) END""".stripMargin
      case "geometric_mean" =>
        """CASE WHEN sum(CASE WHEN nscore > 0 THEN w END) IS NULL THEN 0.0
          |     ELSE exp(sum(CASE WHEN nscore > 0 THEN w * ln(nscore) END)
          |              / sum(CASE WHEN nscore > 0 THEN w END)) END""".stripMargin
      case "harmonic_mean" =>
        """CASE WHEN coalesce(sum(CASE WHEN nscore > 0 THEN w / nscore END), 0.0) <= 0.0 THEN 0.0
          |     ELSE sum(CASE WHEN nscore > 0 THEN w END)
          |          / sum(CASE WHEN nscore > 0 THEN w / nscore END) END""".stripMargin
      case "rrf" =>
        "coalesce(sum(CASE WHEN nscore >= 0 THEN w * nscore END), 0.0)"
    }
    val names = qs.indices.map(i => ('a' + i).toChar.toString)
    val subqCtes = names.zip(qs).map { case (n, sql) => subq(n, sql) }.mkString(",\n")
    val normCtes = names.zipWithIndex.map { case (n, i) => s"n$i AS (${normCte(n)})" }.mkString(", ")
    val unioned = names.indices.map(i => s"SELECT doc_id, nscore, ${ws(i)} AS w FROM n$i")
      .mkString(" UNION ALL ")
    s"""WITH $preamble,
       |$subqCtes,
       |$normCtes,
       |comb AS (
       |  SELECT doc_id, $combine AS score
       |  FROM ($unioned)
       |  GROUP BY doc_id
       |)""".stripMargin
  }

  /** Fully general hybrid oracle: each element of `scoreSqls` is a SELECT
    * producing (doc_id, score) for one subquery (already >0-filtered where
    * the Spark side null-guards), `preamble` carries the shared CTEs the
    * score SELECTs reference (sparse doc vectors, hash embeddings, ...).
    *
    * `subqueryCollapse` = (documents key column, docsPerGroup): collapse
    * each SUBQUERY's matches per key before the K-cut (the
    * HybridCollapsingTopDocsCollector per-subquery semantics).
    * `postFilterWhere`: condition over `documents d` applied to the
    * combined result AFTER normalization/combination (post_filter — does
    * not change normalization statistics). */
  def hybridFromScores(
      scoreSqls: Seq[String],
      norm: String,
      comb: String,
      weightsN: Option[Seq[Double]] = None,
      k: Int = 100,
      from: Int = 0,
      size: Int = 10,
      collapse: Option[(String, Int)] = None,
      preamble: String = docVectorsCte,
      subqueryCollapse: Option[(String, Int)] = None,
      postFilterWhere: Option[String] = None): String = {
    val chain = hybridCombChain(scoreSqls, norm, comb, weightsN, k, preamble, subqueryCollapse)
    val postFilterCte = postFilterWhere match {
      case Some(cond) =>
        s""", pcomb AS (
           |  SELECT c.doc_id, c.score FROM comb c JOIN documents d USING (doc_id)
           |  WHERE $cond
           |)""".stripMargin
      case None => ""
    }
    val combSrc = if (postFilterWhere.isDefined) "pcomb" else "comb"
    val collapseCte = collapse match {
      case Some((keyCol, perGroup)) =>
        s""", coll AS (
           |  SELECT doc_id, score FROM (
           |    SELECT c.doc_id, c.score,
           |           row_number() OVER (PARTITION BY d.$keyCol
           |                ORDER BY c.score DESC, c.doc_id ASC) AS gr
           |    FROM $combSrc c JOIN documents d USING (doc_id)) WHERE gr <= $perGroup
           |)""".stripMargin
      case None => ""
    }
    val rankedSrc = if (collapse.isDefined) "coll" else combSrc
    s"""$chain$postFilterCte$collapseCte, ranked AS (
       |  SELECT doc_id, score,
       |         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
       |  FROM $rankedSrc
       |)
       |SELECT doc_id, round(score, 4) AS score, rank
       |FROM ranked WHERE rank > $from AND rank <= ${from + size} ORDER BY rank""".stripMargin
  }

  /** documents → (doc_id, ck, v DOUBLE[dim]) per-chunk hash embeddings for
    * overlap-0 fixed-token chunking: chunks are contiguous `tokensPerChunk`-
    * token blocks, so membership is (ord-1)//tokensPerChunk; per-(doc,chunk)
    * embed mirrors embedCte (FNV idx, count, L2 with float casts). */
  def chunkEmbedCte(dim: Int, tokensPerChunk: Int, p: String = "nc_"): String = {
    val fnvP = fnvSql("p")
    s"""${p}parts AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS p,
       |         generate_subscripts(string_split(lower(text), ' '), 1) AS ord
       |  FROM documents
       |), ${p}cnt AS (
       |  SELECT doc_id, CAST((ord - 1) // $tokensPerChunk AS INT) AS ck, p, count(*) AS c
       |  FROM ${p}parts WHERE p <> '' GROUP BY 1, 2, 3
       |), ${p}hash AS (
       |  SELECT p, $fnvP % $dim AS idx FROM (SELECT DISTINCT p FROM ${p}cnt)
       |), ${p}idx AS (
       |  SELECT doc_id, ck, idx, CAST(sum(c) AS DOUBLE) AS c
       |  FROM ${p}cnt JOIN ${p}hash USING (p) GROUP BY 1, 2, 3
       |), ${p}vec AS (
       |  SELECT dk.doc_id, dk.ck, list(coalesce(e.c, 0.0) ORDER BY g.i) AS cnts
       |  FROM (SELECT DISTINCT doc_id, ck FROM ${p}cnt) dk
       |  CROSS JOIN (SELECT unnest(range(0, $dim)) AS i) g
       |  LEFT JOIN ${p}idx e ON e.doc_id = dk.doc_id AND e.ck = dk.ck AND e.idx = g.i
       |  GROUP BY dk.doc_id, dk.ck
       |), ${p}emb AS (
       |  SELECT doc_id, ck,
       |         CASE WHEN nrm > 0
       |              THEN list_transform(cnts, x -> CAST(CAST(x / nrm AS REAL) AS DOUBLE))
       |              ELSE cnts END AS v
       |  FROM (SELECT doc_id, ck, cnts,
       |               sqrt(list_sum(list_transform(cnts, x -> x * x))) AS nrm
       |        FROM ${p}vec)
       |)""".stripMargin
  }

  // ------------------------------------------------- sentence highlighting

  /** Sentence segmentation WITH OFFSETS + per-sentence similarity CTEs,
    * replicating Highlight.segmentSentences/scoreSentences: boundaries are
    * marked by chr(1) on BOTH sides of the `[.!?]\s+` separator (RE2 has no
    * lookbehind), so the split alternates sentence/separator pieces whose
    * cumulative lengths ARE the original character offsets; sentences are
    * the odd-position non-empty pieces. Expects an `hl_top(doc_id, …)` CTE
    * selecting the docs to highlight; emits hs_offs (all pieces + offsets),
    * hs_sent (sentences with ord/start/end), hs_sim (float-cast similarity
    * per sentence — zero-token sentences coalesce to 0), hs_best. */
  def sentenceSpanCtes(qEmb: Array[Float], dim: Int = graft.ml.HashEmbedder.DefaultDim): String = {
    val qLit = doubleList(qEmb)
    val fnvP = fnvSql("p")
    s"""hs_marked AS (
       |  SELECT d.doc_id,
       |         string_split(regexp_replace(d.text, '([.!?])(\\s+)',
       |                      '\\1' || chr(1) || '\\2' || chr(1), 'g'), chr(1)) AS parts
       |  FROM documents d JOIN hl_top USING (doc_id)
       |), hs_parts AS (
       |  SELECT doc_id, unnest(parts) AS p, generate_subscripts(parts, 1) AS pord
       |  FROM hs_marked
       |), hs_offs AS (
       |  SELECT doc_id, p, pord,
       |         CAST(coalesce(sum(length(p)) OVER (PARTITION BY doc_id ORDER BY pord
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS sent_start
       |  FROM hs_parts
       |), hs_sent AS (
       |  SELECT doc_id, p AS sent, pord, sent_start,
       |         CAST(sent_start + length(p) AS INT) AS sent_end,
       |         CAST((pord + 1) // 2 AS INT) AS ord
       |  FROM hs_offs WHERE pord % 2 = 1 AND p <> ''
       |), hs_cnt AS (
       |  SELECT doc_id, ord, p, count(*) AS c FROM (
       |    SELECT doc_id, ord, unnest(regexp_split_to_array(lower(sent), '\\s+')) AS p
       |    FROM hs_sent) WHERE p <> '' GROUP BY 1, 2, 3
       |), hs_hash AS (
       |  SELECT p, $fnvP % $dim AS idx FROM (SELECT DISTINCT p FROM hs_cnt)
       |), hs_idx AS (
       |  SELECT doc_id, ord, idx, CAST(sum(c) AS DOUBLE) AS c
       |  FROM hs_cnt JOIN hs_hash USING (p) GROUP BY 1, 2, 3
       |), hs_vec AS (
       |  SELECT dk.doc_id, dk.ord, list(coalesce(e.c, 0.0) ORDER BY g.i) AS cnts
       |  FROM (SELECT DISTINCT doc_id, ord FROM hs_cnt) dk
       |  CROSS JOIN (SELECT unnest(range(0, $dim)) AS i) g
       |  LEFT JOIN hs_idx e ON e.doc_id = dk.doc_id AND e.ord = dk.ord AND e.idx = g.i
       |  GROUP BY dk.doc_id, dk.ord
       |), hs_emb AS (
       |  SELECT doc_id, ord,
       |         CASE WHEN nrm > 0
       |              THEN list_transform(cnts, x -> CAST(CAST(x / nrm AS REAL) AS DOUBLE))
       |              ELSE cnts END AS v
       |  FROM (SELECT doc_id, ord, cnts,
       |               sqrt(list_sum(list_transform(cnts, x -> x * x))) AS nrm
       |        FROM hs_vec)
       |), hs_sim AS (
       |  SELECT s.doc_id, s.ord, s.pord, s.sent_start, s.sent_end,
       |         coalesce(CAST(CAST(${denseDotSql("e.v", qLit)} AS REAL) AS DOUBLE), 0.0) AS sim
       |  FROM hs_sent s LEFT JOIN hs_emb e ON e.doc_id = s.doc_id AND e.ord = s.ord
       |), hs_best AS (
       |  SELECT doc_id, max(sim) AS best FROM hs_sim GROUP BY doc_id
       |)""".stripMargin
  }

  /** Top-5 sparse hits CTE for the highlight oracles (matches the q_highlight
    * query shape: exact sparse top-k on qTokens, score > 0). */
  private def highlightTopCte(qTokens: Map[String, Float], k: Int): String =
    s"""hl_top AS (
       |  SELECT doc_id, score FROM (
       |    SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
       |    FROM (${sparseScoreSql(valuesOf(qTokens))})
       |    WHERE score > 0.0) WHERE rn <= $k
       |)""".stripMargin

  /** Tagged-text highlight oracle (single and batch paths emit the same
    * relation): reconstruct the ORIGINAL text from the alternating pieces,
    * wrapping selected sentences in the tags — original whitespace passes
    * through verbatim, exactly like HighlightTagApplier. */
  def highlightTaggedSql(qTokens: Map[String, Float], qEmb: Array[Float],
      k: Int = 5, threshold: Double = 0.999): String =
    s"""WITH $docVectorsCte,
       |${highlightTopCte(qTokens, k)},
       |${sentenceSpanCtes(qEmb)},
       |hs_mark AS (
       |  SELECT s.doc_id, s.pord, (b.best > 0.0 AND s.sim >= b.best * $threshold) AS hi
       |  FROM hs_sim s JOIN hs_best b USING (doc_id)
       |), hs_tag AS (
       |  SELECT o.doc_id,
       |         string_agg(CASE WHEN coalesce(m.hi, FALSE)
       |                         THEN '<em>' || o.p || '</em>' ELSE o.p END,
       |                    '' ORDER BY o.pord) AS highlights
       |  FROM hs_offs o
       |  LEFT JOIN hs_mark m ON m.doc_id = o.doc_id AND m.pord = o.pord
       |  GROUP BY o.doc_id
       |)
       |SELECT t.doc_id, t.score, g.highlights
       |FROM hl_top t JOIN hs_tag g USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin

  /** Per-sentence span relation oracle: one row per (doc, sentence) with
    * character offsets, similarity, and the highlight decision — the
    * observable form of the QA span model output. */
  def highlightSentencesSql(qTokens: Map[String, Float], qEmb: Array[Float],
      k: Int = 5, threshold: Double = 0.999): String =
    s"""WITH $docVectorsCte,
       |${highlightTopCte(qTokens, k)},
       |${sentenceSpanCtes(qEmb)}
       |SELECT s.doc_id, s.ord, s.sent_start, s.sent_end,
       |       round(s.sim, 6) AS sim,
       |       (b.best > 0.0 AND s.sim >= b.best * $threshold) AS highlighted
       |FROM hs_sim s JOIN hs_best b USING (doc_id)
       |ORDER BY s.doc_id, s.ord""".stripMargin

  /** Word-level answer-span oracle (Highlight.answerSpan): per top hit,
    * pick the top sentence by (round(sim,6) desc, ord asc), enumerate token
    * windows of width 1..maxWindow inside it, hash-embed each window with
    * the same float-cast recipe as the sentence CTEs, and keep the best
    * window by (round(sim,6) desc, span_start asc, width asc). Token
    * offsets come from the chr(1)-marked whitespace split (cumulative piece
    * lengths — no lookbehind), so spans index the ORIGINAL text. */
  def highlightSpansSql(qTokens: Map[String, Float], qEmb: Array[Float],
      k: Int = 5, maxWindow: Int = 8,
      dim: Int = graft.ml.HashEmbedder.DefaultDim): String = {
    val qLit = doubleList(qEmb)
    val fnvP = fnvSql("p")
    s"""WITH $docVectorsCte,
       |${highlightTopCte(qTokens, k)},
       |${sentenceSpanCtes(qEmb)},
       |hw_top AS (
       |  SELECT doc_id, ord, sent_start, sent FROM (
       |    SELECT s.doc_id, s.ord, s.sent_start, t.sent,
       |           row_number() OVER (PARTITION BY s.doc_id
       |                ORDER BY round(s.sim, 6) DESC, s.ord ASC) AS rn,
       |           round(s.sim, 6) AS rsim
       |    FROM hs_sim s JOIN hs_sent t ON t.doc_id = s.doc_id AND t.ord = s.ord)
       |  WHERE rn = 1 AND rsim > 0.0
       |), hw_marked AS (
       |  SELECT doc_id, sent_start,
       |         string_split(regexp_replace(sent, '(\\s+)',
       |                      chr(1) || '\\1' || chr(1), 'g'), chr(1)) AS parts
       |  FROM hw_top
       |), hw_parts AS (
       |  SELECT doc_id, sent_start, unnest(parts) AS p,
       |         generate_subscripts(parts, 1) AS pord
       |  FROM hw_marked
       |), hw_poffs AS (
       |  SELECT doc_id, sent_start, p, pord,
       |         coalesce(sum(length(p)) OVER (PARTITION BY doc_id ORDER BY pord
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rel
       |  FROM hw_parts
       |), hw_tok AS (
       |  SELECT doc_id, p AS tok,
       |         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pord) AS INT) AS tord,
       |         CAST(sent_start + rel AS INT) AS tok_start,
       |         CAST(sent_start + rel + length(p) AS INT) AS tok_end
       |  FROM hw_poffs WHERE p <> '' AND NOT regexp_matches(p, '^\\s+$$')
       |), hw_n AS (SELECT doc_id, CAST(count(*) AS INT) AS n FROM hw_tok GROUP BY doc_id),
       |hw_win AS (
       |  SELECT t.doc_id, w.w, t.tord AS i
       |  FROM hw_tok t JOIN hw_n USING (doc_id)
       |  CROSS JOIN (SELECT CAST(unnest(range(1, ${maxWindow + 1})) AS INT) AS w) w
       |  WHERE w.w <= n AND t.tord <= n - w.w + 1
       |), hw_cnt AS (
       |  SELECT wd.doc_id, wd.w, wd.i, lower(t.tok) AS p, count(*) AS c
       |  FROM hw_win wd
       |  JOIN hw_tok t ON t.doc_id = wd.doc_id
       |       AND t.tord BETWEEN wd.i AND wd.i + wd.w - 1
       |  GROUP BY 1, 2, 3, 4
       |), hw_hash AS (
       |  SELECT p, $fnvP % $dim AS idx FROM (SELECT DISTINCT p FROM hw_cnt)
       |), hw_idx AS (
       |  SELECT doc_id, w, i, idx, CAST(sum(c) AS DOUBLE) AS c
       |  FROM hw_cnt JOIN hw_hash USING (p) GROUP BY 1, 2, 3, 4
       |), hw_vec AS (
       |  SELECT dk.doc_id, dk.w, dk.i, list(coalesce(e.c, 0.0) ORDER BY g.gi) AS cnts
       |  FROM (SELECT DISTINCT doc_id, w, i FROM hw_cnt) dk
       |  CROSS JOIN (SELECT unnest(range(0, $dim)) AS gi) g
       |  LEFT JOIN hw_idx e ON e.doc_id = dk.doc_id AND e.w = dk.w
       |       AND e.i = dk.i AND e.idx = g.gi
       |  GROUP BY 1, 2, 3
       |), hw_emb AS (
       |  SELECT doc_id, w, i,
       |         CASE WHEN nrm > 0
       |              THEN list_transform(cnts, x -> CAST(CAST(x / nrm AS REAL) AS DOUBLE))
       |              ELSE cnts END AS v
       |  FROM (SELECT doc_id, w, i, cnts,
       |               sqrt(list_sum(list_transform(cnts, x -> x * x))) AS nrm
       |        FROM hw_vec)
       |), hw_sim AS (
       |  SELECT e.doc_id, e.w, e.i,
       |         round(CAST(CAST(${denseDotSql("e.v", qLit)} AS REAL) AS DOUBLE), 6) AS sim
       |  FROM hw_emb e
       |), hw_best AS (
       |  SELECT doc_id, span_start, span_end, sim FROM (
       |    SELECT s.doc_id, s.sim, a.tok_start AS span_start, b.tok_end AS span_end,
       |           row_number() OVER (PARTITION BY s.doc_id
       |                ORDER BY s.sim DESC, a.tok_start ASC, s.w ASC) AS rn
       |    FROM hw_sim s
       |    JOIN hw_tok a ON a.doc_id = s.doc_id AND a.tord = s.i
       |    JOIN hw_tok b ON b.doc_id = s.doc_id AND b.tord = s.i + s.w - 1)
       |  WHERE rn = 1 AND sim > 0.0
       |)
       |SELECT t.doc_id, CAST(p.ord AS INT) AS ord, b.span_start, b.span_end, b.sim
       |FROM hl_top t JOIN hw_top p USING (doc_id) JOIN hw_best b USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin
  }
}
