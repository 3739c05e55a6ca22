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
      collapse: Option[(String, Int)] = None): String = {
    def subq(name: String, values: String): String =
      s"""s_$name AS (${sparseScoreSql(values)}),
         |k_$name AS (
         |  SELECT doc_id, score FROM (
         |    SELECT doc_id, score,
         |           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
         |    FROM s_$name) WHERE rn <= $k
         |)""".stripMargin
    def normCte(name: String): String = norm match {
      case "min_max" =>
        s"""SELECT doc_id,
           |       CASE WHEN mx = mn AND mx = score THEN 1.0
           |            WHEN (score - mn) / (mx - mn) = 0.0 THEN 0.001
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
        s"""SELECT doc_id,
           |       CASE WHEN score = mean THEN mx
           |            WHEN sd IS NULL OR sd = 0.0 THEN mn
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
        """coalesce(sum(CASE WHEN nscore >= 0 THEN w * nscore END)
          |         / sum(CASE WHEN nscore >= 0 THEN w END), 0.0)""".stripMargin
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
    val collapseCte = collapse match {
      case Some((keyCol, perGroup)) =>
        s""", coll AS (
           |  SELECT doc_id, score FROM (
           |    SELECT comb.doc_id, comb.score,
           |           row_number() OVER (PARTITION BY d.$keyCol
           |                ORDER BY comb.score DESC, comb.doc_id ASC) AS gr
           |    FROM comb JOIN documents d USING (doc_id)) WHERE gr <= $perGroup
           |)""".stripMargin
      case None => ""
    }
    val rankedSrc = if (collapse.isDefined) "coll" else "comb"
    val names = qs.indices.map(i => ('a' + i).toChar.toString)
    val subqCtes = names.zip(qs).map { case (n, q) => subq(n, valuesOf(q)) }.mkString(",\n")
    val normCtes = names.zipWithIndex.map { case (n, i) => s"n$i AS (${normCte(n)})" }.mkString(", ")
    val unioned = names.indices.map(i => s"SELECT doc_id, nscore, ${ws(i)} AS w FROM n$i")
      .mkString(" UNION ALL ")
    s"""WITH $docVectorsCte,
       |$subqCtes,
       |$normCtes,
       |comb AS (
       |  SELECT doc_id, $combine AS score
       |  FROM ($unioned)
       |  GROUP BY doc_id
       |)$collapseCte, ranked AS (
       |  SELECT doc_id, score,
       |         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
       |  FROM $rankedSrc
       |)
       |SELECT doc_id, round(score, 4) AS score, rank
       |FROM ranked WHERE rank > $from AND rank <= ${from + size} ORDER BY rank""".stripMargin
  }
}
