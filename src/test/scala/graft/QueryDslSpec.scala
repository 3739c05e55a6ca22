package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._

/** JSON request DSL parsing — reference-shaped bodies in, QueryRequest out. */
class QueryDslSpec extends AnyFunSuite {

  test("hybrid body with pagination_depth, size, from, collapse") {
    val req = QueryDsl.parse(
      """{"query": {"hybrid": {"pagination_depth": 50, "queries": [
        |  {"neural": {"text": {"query_text": "q1", "model_id": "m"}}},
        |  {"neural_sparse": {"text": {"query_text": "q2"}}}]}},
        | "from": 5, "size": 15, "collapse": {"field": "lang"}}""".stripMargin)
    assert(req.subqueries.map(_.kind) == Seq("neural", "neural_sparse"))
    assert(req.subqueries.head.modelId.contains("m"))
    assert(req.paginationDepth.contains(50))
    assert(req.from == 5 && req.k == 15)
    assert(req.collapseField.contains("lang"))
  }

  test("neural per-subquery k / min_score carried; combining them rejects") {
    val withK = QueryDsl.parse(
      """{"query": {"neural": {"emb": {"query_text": "q", "k": 50}}}}""")
    assert(withK.subqueries.head.k.contains(50))
    val withMs = QueryDsl.parse(
      """{"query": {"neural": {"emb": {"query_text": "q", "min_score": 0.8}}}}""")
    assert(withMs.subqueries.head.minScore.contains(0.8))
    // NeuralQueryValidationUtil.countKnnQueryTypes: only one of
    // k / max_distance / min_score
    intercept[IllegalArgumentException](QueryDsl.parse(
      """{"query": {"neural": {"emb": {"query_text": "q", "k": 50, "min_score": 0.8}}}}"""))
  }

  test("neural rescore forms: object, true, false, invalid") {
    val obj = QueryDsl.parse(
      """{"query": {"neural": {"emb": {"query_text": "q",
        |  "rescore": {"oversample_factor": 3.0}}}}}""".stripMargin)
    assert(obj.subqueries.head.rescoreOversample.contains(3.0))
    val on = QueryDsl.parse(
      """{"query": {"neural": {"emb": {"query_text": "q", "rescore": true}}}}""")
    assert(on.subqueries.head.rescoreOversample.contains(1.0))
    val off = QueryDsl.parse(
      """{"query": {"neural": {"emb": {"query_text": "q", "rescore": false}}}}""")
    assert(off.subqueries.head.rescoreOversample.isEmpty)
    intercept[IllegalArgumentException](QueryDsl.parse(
      """{"query": {"neural": {"emb": {"query_text": "q", "rescore": "yes"}}}}"""))
    intercept[IllegalArgumentException](QueryDsl.parse(
      """{"query": {"neural": {"emb": {"query_text": "q",
        |  "rescore": {"oversample_factor": -1.0}}}}}""".stripMargin))
  }

  test("neural expand_nested and semantic_field_search_analyzer parse") {
    val req = QueryDsl.parse(
      """{"query": {"neural": {"body": {"query_text": "q", "expand_nested": true,
        |  "semantic_field_search_analyzer": "standard"}}}}""".stripMargin)
    assert(req.subqueries.head.expandNested.contains(true))
    assert(req.subqueries.head.searchAnalyzer.contains("standard"))
    // empty analyzer rejects (validateNeuralQueryForSemanticSparse)
    intercept[IllegalArgumentException](QueryDsl.parse(
      """{"query": {"neural": {"body": {"query_text": "q",
        |  "semantic_field_search_analyzer": ""}}}}""".stripMargin))
    // model_id + analyzer can not coexist
    intercept[IllegalArgumentException](QueryDsl.parse(
      """{"query": {"neural": {"body": {"query_text": "q", "model_id": "m",
        |  "semantic_field_search_analyzer": "standard"}}}}""".stripMargin))
  }

  test("semantic_field_search_analyzer on a dense target rejects at compile") {
    import org.apache.spark.sql.SparkSession
    val spark = SparkSession.builder().master("local[2]").getOrCreate()
    import spark.implicits._
    val corpus = Seq((1L, "spark join")).toDF("doc_id", "body")
    val req = QueryDsl.parse(
      """{"query": {"neural": {"body": {"query_text": "q",
        |  "semantic_field_search_analyzer": "standard"}}}}""".stripMargin,
      fieldSpecs = Seq(FieldSpec("body", FieldKind.Semantic(dense = true))))
    val err = intercept[IllegalArgumentException](
      graft.exec.QueryCompiler.run(corpus, req))
    assert(err.getMessage.contains("sparse model"))
    // on a sparse semantic target the same body compiles (rewritten to the
    // analyzer token path: query tokens at weight 1.0) and matches
    val sparseReq = QueryDsl.parse(
      """{"query": {"neural": {"body": {"query_text": "spark",
        |  "semantic_field_search_analyzer": "standard"}}}}""".stripMargin,
      fieldSpecs = Seq(FieldSpec("body", FieldKind.Semantic(dense = false))))
    val out = graft.exec.QueryCompiler.run(corpus, sparseReq).collect()
    assert(out.nonEmpty)
  }

  test("neural_sparse method_parameters parse and reject invalid forms") {
    val req = QueryDsl.parse(
      """{"query": {"neural_sparse": {"tokens": {"query_text": "q",
        |  "method_parameters": {"top_n": 8, "k": 20, "heap_factor": 1.5}}}}}""".stripMargin)
    val sq = req.subqueries.head
    assert(sq.methodTopN.contains(8) && sq.methodK.contains(20)
      && sq.methodHeapFactor.contains(1.5f))
    // unknown key and non-positive values are parse errors
    // (SparseAnnQueryBuilder.fromXContent)
    intercept[IllegalArgumentException](QueryDsl.parse(
      """{"query": {"neural_sparse": {"tokens": {"query_text": "q",
        |  "method_parameters": {"ef_search": 10}}}}}""".stripMargin))
    intercept[IllegalArgumentException](QueryDsl.parse(
      """{"query": {"neural_sparse": {"tokens": {"query_text": "q",
        |  "method_parameters": {"top_n": 0}}}}}""".stripMargin))
    intercept[IllegalArgumentException](QueryDsl.parse(
      """{"query": {"neural_sparse": {"tokens": {"query_text": "q",
        |  "method_parameters": {"heap_factor": -2.0}}}}}""".stripMargin))
  }

  test("neural max_distance and query_image parse; both radial forms reject") {
    val req = QueryDsl.parse(
      """{"query": {"neural": {"emb": {"query_text": "q", "max_distance": 0.3,
        |  "query_image": "aW1n"}}}}""".stripMargin)
    assert(req.subqueries.head.maxDistance.contains(0.3))
    assert(req.subqueries.head.queryImage.contains("aW1n"))
    // compile-time guard: min_score AND max_distance together is an error
    // (NeuralQueryBuilder.java:166-170)
    val both = req.subqueries.head.copy(minScore = Some(0.5))
    intercept[IllegalArgumentException] {
      graft.exec.QueryCompiler.scoreColumn(both)
    }
  }

  test("neural_sparse token map, analyzer, match/term/range forms") {
    val req = QueryDsl.parse(
      """{"query": {"hybrid": {"queries": [
        |  {"neural_sparse": {"text": {"query_tokens": {"spark": 1.5, "join": 0.5}}}},
        |  {"neural_sparse": {"text": {"query_text": "q", "analyzer": "standard"}}},
        |  {"match": {"title": {"query": "hello world"}}},
        |  {"term": {"lang": {"value": "en"}}},
        |  {"range": {"n_chars": {"gte": 100, "lt": 500}}}]}}}""".stripMargin)
    val Seq(sp, an, m, t, r) = req.subqueries
    assert(sp.queryTokens.contains(Map("spark" -> 1.5f, "join" -> 0.5f)))
    assert(an.analyzer.contains("standard"))
    assert(m.kind == "match" && m.queryText.contains("hello world"))
    assert(t.kind == "term" && t.queryText.contains("en"))
    assert(r.kind == "range" && r.queryText.contains("100..500"))
  }

  test("short forms: term/match with direct string values") {
    val req = QueryDsl.parse(
      """{"query": {"term": {"lang": "en"}}, "size": 3}""")
    assert(req.subqueries == Seq(SubquerySpec("term", "lang", queryText = Some("en"))))
    assert(req.k == 3)
  }

  test("pipeline: techniques, weights, rank_constant, min_max bounds") {
    val (n1, c1) = QueryDsl.parsePipeline(
      """{"phase_results_processors": [{"normalization-processor": {
        |  "normalization": {"technique": "l2"},
        |  "combination": {"technique": "geometric_mean",
        |                  "parameters": {"weights": [0.7, 0.3]}}}}]}""".stripMargin)
    assert(n1 == NormalizationSpec.L2)
    assert(c1 == CombinationSpec.GeometricMean(Some(Seq(0.7, 0.3))))

    val (n2, c2) = QueryDsl.parsePipeline(
      """{"phase_results_processors": [{"score-ranker-processor": {
        |  "normalization": {"technique": "rrf", "parameters": {"rank_constant": 40}},
        |  "combination": {"technique": "rrf"}}}]}""".stripMargin)
    assert(n2 == NormalizationSpec.RRF(40) && c2 == CombinationSpec.RRF(None))

    val (n3, _) = QueryDsl.parsePipeline(
      """{"normalization": {"technique": "min_max", "parameters": {
        |   "lower_bounds": [{"mode": "apply", "min_score": 0.2}, {"mode": "clip", "min_score": 0.1}]}},
        | "combination": {"technique": "arithmetic_mean"}}""".stripMargin)
    n3 match {
      case NormalizationSpec.MinMax(bounds) =>
        assert(bounds.length == 2)
        assert(bounds(0)._1 == ScoreBound(enabled = true, BoundMode.Apply, 0.2f))
        assert(bounds(1)._1 == ScoreBound(enabled = true, BoundMode.Clip, 0.1f))
        assert(bounds(0)._2 == ScoreBound.disabledUpper)
      case other => fail(s"expected MinMax, got $other")
    }
  }

  test("sort forms parse to ordered SortFields; search_after parses typed") {
    import graft.exec.HybridPipeline.SortField
    def parseSort(sort: String, after: String = "") = QueryDsl.parse(
      s"""{"query": {"term": {"lang": "en"}}, "sort": $sort
         |${if (after.nonEmpty) s""", "search_after": $after""" else ""}}""".stripMargin)
    assert(parseSort("\"lang\"").sortFields == Seq(SortField("lang", true)))
    assert(parseSort("""[{"lang": "desc"}]""").sortFields == Seq(SortField("lang", false)))
    assert(parseSort("""[{"lang": {"order": "desc"}}, "n_chars"]""").sortFields ==
      Seq(SortField("lang", false), SortField("n_chars", true)))
    assert(parseSort("""{"lang": "asc"}""").sortFields == Seq(SortField("lang", true)))
    // _score alone = plain score sort; mixed with fields rejects
    assert(parseSort("\"_score\"").sortFields.isEmpty)
    intercept[IllegalArgumentException](parseSort("""["lang", "_score"]"""))
    // typed cursor values, null allowed (null-key cursor row)
    val req = parseSort("""[{"lang": "asc"}, {"n_chars": "desc"}]""",
      """["en", 300, 42]""")
    assert(req.searchAfter.contains(Seq("en", 300L, 42L)))
    val reqN = parseSort("\"lang\"", """[null, 7]""")
    assert(reqN.searchAfter.contains(Seq(null, 7L)))
  }

  test("sorted DSL body routes through the field collector") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      (1L, Map("a" -> 2f), "de", 50L), (2L, Map("a" -> 5f), "en", 70L),
      (3L, Map("a" -> 4f), "en", 30L), (4L, Map("a" -> 1f), "fr", 90L),
      (5L, Map("a" -> 3f), "en", 70L)
    ).toDF("doc_id", "tokens", "lang", "n_chars")
    val body =
      """{"query": {"neural_sparse": {"text": {"query_tokens": {"a": 1.0}}}},
        | "size": 3, "sort": [{"lang": "asc"}, {"n_chars": "desc"}]}""".stripMargin
    val req0 = QueryDsl.parse(body)
    val req = req0.copy(subqueries = req0.subqueries.map(_.copy(tokensCol = Some("tokens"))))
    val out = graft.exec.QueryCompiler.run(docs, req)
      .orderBy(col("rank")).select("doc_id").as[Long].collect().toSeq
    // lang asc, n_chars desc, doc_id asc: de(1), en 70 (2), en 70 (5)
    assert(out == Seq(1L, 2L, 5L))
    // search_after cursor at the ("en", 70, 2) row resumes at doc 5
    val after = QueryDsl.parse(
      """{"query": {"neural_sparse": {"text": {"query_tokens": {"a": 1.0}}}},
        | "size": 2, "sort": [{"lang": "asc"}, {"n_chars": "desc"}],
        | "search_after": ["en", 70, 2]}""".stripMargin)
    val afterReq = after.copy(subqueries = after.subqueries.map(_.copy(tokensCol = Some("tokens"))))
    val page = graft.exec.QueryCompiler.run(docs, afterReq)
      .select("doc_id").as[Long].collect().toSeq
    assert(page == Seq(5L, 3L))
    // from + search_after rejects (reference guard)
    val bad = afterReq.copy(from = 3)
    intercept[IllegalArgumentException](graft.exec.QueryCompiler.run(docs, bad))
  }

  test("nested hybrid and unknown kinds are rejected") {
    val e = intercept[IllegalArgumentException] {
      QueryDsl.parse(
        """{"query": {"hybrid": {"queries": [{"hybrid": {"queries": []}}]}}}""")
    }
    assert(e.getMessage.contains("cannot be nested"))
    intercept[IllegalArgumentException] {
      QueryDsl.parse("""{"query": {"wibble": {"f": {"x": 1}}}}""")
    }
  }
}
