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

  test("neural per-subquery k and min_score are carried, not dropped") {
    val req = QueryDsl.parse(
      """{"query": {"neural": {"emb": {"query_text": "q", "k": 50, "min_score": 0.8}}}}""")
    assert(req.subqueries.head.k.contains(50))
    assert(req.subqueries.head.minScore.contains(0.8))
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
