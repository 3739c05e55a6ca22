package graft

import org.apache.spark.sql.functions._
import graft.exec.QueryCompiler
import graft.exec.QueryCompiler.QueryRequest
import graft.model._

class QueryCompilerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "spark join table fast", "en", 120),
    (2L, "slow scan big table", "en", 300),
    (3L, "spark spark stream window", "de", 80),
    (4L, "unrelated words entirely here", "en", 500),
    (5L, "spark join fast fast", "de", 150)
  ).toDF("doc_id", "text", "lang", "n_chars")

  test("4-kind hybrid: neural + sparse + term + range through one compile") {
    val req = QueryRequest(subqueries = Seq(
      SubquerySpec("neural", "text", queryText = Some("spark join table fast")),
      SubquerySpec("neural_sparse", "text", queryText = Some("spark join")),
      SubquerySpec("term", "lang", queryText = Some("en")),
      SubquerySpec("range", "n_chars", queryText = Some("100..400"))))
    val out = QueryCompiler.run(corpus, req).collect()
    assert(out.nonEmpty)
    // doc1 matches all four subqueries → must rank first
    assert(out.head.getAs[Long]("doc_id") == 1L)
    val ranks = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rank")).toMap
    assert(ranks.values.toSeq.sorted == (1 to out.length).toSeq)
  }

  test("filter is applied below scoring; collapse keeps top doc per group") {
    val req = QueryRequest(
      subqueries = Seq(SubquerySpec("neural_sparse", "text", queryText = Some("spark join"))),
      filterExpr = Some("n_chars >= 100"),
      collapseField = Some("lang"))
    val out = QueryCompiler.run(corpus, req).collect()
    assert(!out.map(_.getAs[Long]("doc_id")).contains(3L)) // filtered (n_chars 80)
    // collapse: at most one doc per lang
    val langOf = Map(1L -> "en", 2L -> "en", 4L -> "en", 5L -> "de")
    val langs = out.map(r => langOf(r.getAs[Long]("doc_id")))
    assert(langs.distinct.length == langs.length)
  }

  test("explain variant returns fragments; validation rejects nested hybrid") {
    val req = QueryRequest(
      subqueries = Seq(SubquerySpec("neural_sparse", "text", queryText = Some("spark"))),
      explain = true)
    val out = QueryCompiler.run(corpus, req).collect()
    assert(out.forall(!_.isNullAt(out.head.fieldIndex("explain"))))
    intercept[IllegalArgumentException] {
      QueryCompiler.scoreColumn(SubquerySpec("hybrid", "text"))
    }
  }

  test("natural-language entry end-to-end (agentic path)") {
    val out = QueryCompiler.runNaturalLanguage(
      corpus, "find \"spark join\" fast documents", Seq("text"))
    assert(out.count() > 0)
  }

  test("neural min_score acts as a per-subquery radial cut") {
    val all = QueryCompiler.run(corpus, QueryRequest(subqueries = Seq(
      SubquerySpec("neural", "text", queryText = Some("spark join table fast"))))).collect()
    assert(all.length > 1)
    // with a cut just under the best raw cosine only the parallel-vector
    // docs survive (doc 1 exactly, doc 5 via 8-dim hash collision — its
    // count vector is parallel to the query's); the others are excluded
    val cut = QueryCompiler.run(corpus, QueryRequest(subqueries = Seq(
      SubquerySpec("neural", "text", queryText = Some("spark join table fast"),
        minScore = Some(0.999))))).collect()
    assert(cut.length < all.length)
    assert(cut.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 5L))
  }

  test("neural_sparse analyzer path: tokens at weight 1.0, no inference") {
    val req = QueryRequest(subqueries = Seq(
      SubquerySpec("neural_sparse", "text", queryText = Some("spark join"),
        analyzer = Some("standard"))))
    val out = QueryCompiler.run(corpus, req).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    // analyzer weights are 1.0 per distinct query token, so the RAW score
    // of doc 1 is w_d(spark)+w_d(join) = 2*(1+ln 2); with min_max over the
    // candidate set doc 1 (both tokens, max weights) normalizes to 1.0
    assert(out.contains(1L) && out(1L) == 1.0)
    assert(!out.contains(4L)) // no token overlap -> no match
  }

  test("field-sorted hybrid: rank follows sort key, not score") {
    import graft.exec.HybridPipeline
    import org.apache.spark.sql.functions._
    val docs = corpus.withColumn("tokens", graft.ingest.Enrich.encodeUdf(col("text")))
    val q = graft.ml.HashEmbedder.encode("spark join")
    val sc0 = round(graft.functions.VectorExpressions.sparse_dot(col("tokens"), typedLit(q)), 6)
    val scored = HybridPipeline.score(docs, col("doc_id"), Seq(when(sc0 > 0.0, sc0)))
    val sortKeys = corpus.select(col("doc_id"), col("n_chars").as("sort_key"))
    val out = HybridPipeline.runSorted(scored, 1, NormalizationSpec.MinMax(),
      CombinationSpec.ArithmeticMean(), sortKeys, ascending = false).collect()
    val byRank = out.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc_id"))
    // matching docs are 1, 3, 5 ('spark'/'join' overlap); order = n_chars
    // desc: doc5 (150), doc1 (120), doc3 (80) — NOT score order (doc1 has
    // the highest score but ranks second)
    assert(byRank.toSeq == Seq(5L, 1L, 3L))
    // a doc MISSING from sortKeys is kept and sorts last, not dropped
    val partialKeys = sortKeys.where(col("doc_id") =!= 5L)
    val out2 = HybridPipeline.runSorted(scored, 1, NormalizationSpec.MinMax(),
      CombinationSpec.ArithmeticMean(), partialKeys, ascending = false).collect()
    val byRank2 = out2.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc_id"))
    assert(byRank2.toSeq == Seq(1L, 3L, 5L))
  }

  test("bm25Score matches the hand-computed BM25Similarity formula") {
    import graft.exec.Lexical
    import spark.implicits._
    // punctuation exercises the standard-analyzer split; doc 3 never matches
    val docs = Seq(
      (1L, "Spark joins fast, spark SCANS tables—spark!"),
      (2L, "a fast table scan beats a slow join"),
      (3L, "unrelated words entirely here"),
      (4L, "")
    ).toDF("doc_id", "text")
    val got = Lexical.bm25Score(docs, Seq("spark", "scan", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference math in plain scala
    def toks(s: String) = s.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
    val all = Map(1L -> toks("Spark joins fast, spark SCANS tables—spark!"),
      2L -> toks("a fast table scan beats a slow join"),
      3L -> toks("unrelated words entirely here"), 4L -> Seq.empty[String])
    val n = all.size.toDouble
    val avgdl = all.values.map(_.size).sum / n
    val terms = Seq("spark", "scan", "join")
    val tf = all.map { case (id, ts) => id -> terms.map(t => t -> ts.count(_ == t).toDouble).toMap }
    val dfm = terms.map(t => t -> tf.values.count(_(t) > 0).toDouble).toMap
    def score(id: Long): Double = {
      val dl = all(id).size.toDouble
      val s = terms.map { t =>
        val f = tf(id)(t)
        if (f == 0) 0.0
        else math.log(1 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5)) *
          f / (f + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
      }.sum
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.keySet == Set(1L, 2L))
    assert(math.abs(got(1L) - score(1L)) < 1e-9)
    assert(math.abs(got(2L) - score(2L)) < 1e-9)
    // doc 1 has tf(spark)=3 but doc 2 matches more distinct rare terms —
    // both directions of the formula live in the fixture
    assert(got(1L) != got(2L))
  }

  test("SQL function registration exposes the native expressions") {
    Graft.registerFunctions(spark)
    corpus.createOrReplaceTempView("qc_corpus")
    val r = spark.sql(
      """SELECT doc_id, sparse_dot(map('spark', CAST(1.0 AS FLOAT)),
        |                          map('spark', CAST(2.0 AS FLOAT))) AS s
        |FROM qc_corpus WHERE doc_id = 1""".stripMargin).collect()
    assert(r(0).getDouble(1) == 2.0)
    val d = spark.sql(
      "SELECT dense_cosine(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS c")
      .collect()
    assert(math.abs(d(0).getDouble(0) - 1.0) < 1e-9)
  }
}
