package graft

import org.apache.spark.sql.functions._
import graft.exec.{Combination, HybridPipeline, Normalization}
import graft.functions.VectorExpressions._
import graft.model._

class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  test("dense_dot and dense_cosine match scala math") {
    val df = Seq(
      (1L, Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (2L, Array(1f, 0f, 0f), Array(0f, 1f, 0f))
    ).toDF("id", "a", "b")
    val rows = df.select($"id", dense_dot($"a", $"b").as("dot"), dense_cosine($"a", $"b").as("cos"))
      .orderBy("id").collect()
    assert(math.abs(rows(0).getDouble(1) - 32.0) < 1e-9)
    val expCos = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(rows(0).getDouble(2) - expCos) < 1e-9)
    assert(rows(1).getDouble(1) == 0.0 && rows(1).getDouble(2) == 0.0)
  }

  test("dense ops null-safe") {
    val df = Seq((1L, Option.empty[Array[Float]], Option(Array(1f)))).toDF("id", "a", "b")
    assert(df.select(dense_dot($"a", $"b")).collect()(0).isNullAt(0))
  }

  test("sparse_dot with literal query map") {
    val df = Seq((1L, Map("a" -> 2f, "b" -> 3f)), (2L, Map("c" -> 1f))).toDF("id", "m")
    val q = typedLit(Map("a" -> 10f, "c" -> 5f))
    val r = df.select($"id", sparse_dot($"m", q).as("s")).orderBy("id").collect()
    assert(r(0).getDouble(1) == 20.0)
    assert(r(1).getDouble(1) == 5.0)
  }

  test("multiple dense ops over NON-nullable inputs stay in codegen (freshName, no collisions)") {
    // Non-nullable children mean nullSafeCodeGen does NOT brace-wrap the
    // result code, so fixed local names would collide across ops in one
    // projection. fallback=false turns a janino failure into a hard error.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(2).select(
        array($"id".cast("float"), lit(2f)).as("a"),
        array(lit(3f), lit(4f)).as("b"))
      val r = df.select(
        dense_dot($"a", $"b").as("d1"),
        dense_dot($"b", $"b").as("d2"),
        dense_cosine($"a", $"b").as("c1"),
        dense_cosine($"b", $"a").as("c2")
      ).orderBy("d1").collect()
      assert(r(0).getDouble(0) == 8.0) // (0,2)·(3,4)
      assert(r(0).getDouble(1) == 25.0)
      assert(r(1).getDouble(0) == 11.0) // (1,2)·(3,4)
      assert(math.abs(r(1).getDouble(2) - r(1).getDouble(3)) < 1e-12)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }
}

class NormalizationSpec_ extends SparkSpec {
  import spark.implicits._

  // (query_id, subq, doc_id, score)
  private def rel(rows: (Long, Int, Long, Double)*) =
    rows.toDF("query_id", "subq", "doc_id", "score")

  private def scoresOf(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Double] =
    df.collect().map(r => (r.getInt(1), r.getLong(2)) -> r.getDouble(3)).toMap

  test("min_max basic + floor") {
    val out = scoresOf(Normalization.minMax(rel(
      (0, 0, 1, 10.0), (0, 0, 2, 5.0), (0, 0, 3, 0.0))))
    assert(math.abs(out((0, 1L)) - 1.0) < 1e-9)
    assert(math.abs(out((0, 2L)) - 0.5) < 1e-9)
    assert(out((0, 3L)) == 0.001) // 0 result floored to MIN_SCORE
  }

  test("min_max single score -> 1.0") {
    val out = scoresOf(Normalization.minMax(rel((0, 0, 1, 42.0))))
    assert(out((0, 1L)) == 1.0)
  }

  test("min_max all-equal scores -> 1.0") {
    val out = scoresOf(Normalization.minMax(rel((0, 0, 1, 7.0), (0, 0, 2, 7.0))))
    assert(out((0, 1L)) == 1.0 && out((0, 2L)) == 1.0)
  }

  test("min_max normalizes per (query, subquery) scope") {
    val out = scoresOf(Normalization.minMax(rel(
      (0, 0, 1, 10.0), (0, 0, 2, 0.0), (0, 1, 1, 100.0), (0, 1, 2, 200.0))))
    assert(math.abs(out((1, 1L)) - 0.001) < 1e-9) // min of ITS subquery → floor
    assert(math.abs(out((1, 2L)) - 1.0) < 1e-9)
  }

  test("l2 normalization; zero norm -> 0.0 (L2's own MIN_SCORE)") {
    val out = scoresOf(Normalization.l2(rel((0, 0, 1, 3.0), (0, 0, 2, 4.0))))
    assert(math.abs(out((0, 1L)) - 0.6) < 1e-9)
    assert(math.abs(out((0, 2L)) - 0.8) < 1e-9)
    val z = scoresOf(Normalization.l2(rel((0, 0, 1, 0.0))))
    assert(z((0, 1L)) == 0.0)
  }

  test("z_score reference edge cases: below-mean floor, all-equal -> max") {
    val out = scoresOf(Normalization.zScore(rel((0, 0, 1, 1.0), (0, 0, 2, 3.0))))
    // sample stddev of {1,3} = sqrt(2); mean 2; below-mean z floored to 0.001
    assert(out((0, 1L)) == 0.001)
    assert(math.abs(out((0, 2L)) - (1.0 / math.sqrt(2))) < 1e-9)
    // score == mean -> per-subquery max raw score (reference edge-case order)
    val e = scoresOf(Normalization.zScore(rel((0, 0, 1, 5.0), (0, 0, 2, 5.0))))
    assert(e((0, 1L)) == 5.0 && e((0, 2L)) == 5.0)
    // three scores where the middle equals the mean -> gets the max (4.0)
    val m = scoresOf(Normalization.zScore(rel((0, 0, 1, 2.0), (0, 0, 2, 3.0), (0, 0, 3, 4.0))))
    assert(m((0, 2L)) == 4.0)
    assert(m((0, 1L)) == 0.001)
    assert(math.abs(m((0, 3L)) - 1.0) < 1e-9) // (4-3)/1
  }

  test("rrf rank-based scores with rank_constant") {
    val out = scoresOf(Normalization.rrf(rel(
      (0, 0, 1, 9.0), (0, 0, 2, 8.0), (0, 0, 3, 7.0)), rankConstant = 60))
    assert(math.abs(out((0, 1L)) - 1.0 / 61) < 1e-9)
    assert(math.abs(out((0, 2L)) - 1.0 / 62) < 1e-9)
    assert(math.abs(out((0, 3L)) - 1.0 / 63) < 1e-9)
  }
}

class CombinationSpec_ extends SparkSpec {
  import spark.implicits._

  private def rel(rows: (Long, Int, Long, Double)*) =
    rows.toDF("query_id", "subq", "doc_id", "score")

  private def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap

  test("arithmetic mean with doc matched by subset of subqueries (skip semantics)") {
    val out = scores(Combination.combine(rel(
      (0, 0, 1, 0.8), (0, 1, 1, 0.4), // doc1 in both
      (0, 0, 2, 0.6) // doc2 only in subquery 0
    ), CombinationSpec.ArithmeticMean()))
    assert(math.abs(out(1L) - 0.6) < 1e-9)
    assert(math.abs(out(2L) - 0.6) < 1e-9) // NOT averaged with missing subquery
  }

  test("weighted arithmetic mean") {
    val out = scores(Combination.combine(rel(
      (0, 0, 1, 1.0), (0, 1, 1, 0.5)),
      CombinationSpec.ArithmeticMean(Some(Seq(3.0, 1.0)))))
    assert(math.abs(out(1L) - (3.0 * 1.0 + 1.0 * 0.5) / 4.0) < 1e-9)
  }

  test("geometric mean skips non-positive scores") {
    val out = scores(Combination.combine(rel(
      (0, 0, 1, 0.5), (0, 1, 1, 0.0)), CombinationSpec.GeometricMean()))
    assert(math.abs(out(1L) - 0.5) < 1e-9)
  }

  test("harmonic mean") {
    val out = scores(Combination.combine(rel(
      (0, 0, 1, 0.5), (0, 1, 1, 0.25)), CombinationSpec.HarmonicMean()))
    assert(math.abs(out(1L) - 2.0 / (1 / 0.5 + 1 / 0.25)) < 1e-9)
  }

  test("rrf combination is a weighted SUM not a mean") {
    val out = scores(Combination.combine(rel(
      (0, 0, 1, 1.0 / 61), (0, 1, 1, 1.0 / 62)), CombinationSpec.RRF()))
    assert(math.abs(out(1L) - (1.0 / 61 + 1.0 / 62)) < 1e-9)
  }
}

class HybridPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("end-to-end hybrid: score -> topK -> min_max -> arithmetic mean -> rank") {
    // 4 docs; subquery0 scores: d1=10 d2=5 d3=0(match) d4=null(no match)
    // subquery1 scores: d1=null d2=2 d3=4 d4=6
    val corpus = Seq(
      (1L, Some(10.0), Option.empty[Double]),
      (2L, Some(5.0), Some(2.0)),
      (3L, Some(0.0), Some(4.0)),
      (4L, None, Some(6.0))
    ).toDF("doc_id", "s0", "s1")
    val scored = HybridPipeline.score(corpus, col("doc_id"), Seq(col("s0"), col("s1")))
    val out = HybridPipeline.run(
      scored, 2, NormalizationSpec.MinMax(), CombinationSpec.ArithmeticMean(), size = 4)
      .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getInt(3))).toMap
    // subq0: min0 max10 → d1=1.0 d2=0.5 d3=0.001(floor)
    // subq1: min2 max6 → d2=0.001(floor) d3=0.5 d4=1.0
    // combine: d1=1.0(only s0) d2=(0.5+0.001)/2 d3=(0.001+0.5)/2 d4=1.0
    assert(out(1L)._1 == 1.0 && out(4L)._1 == 1.0)
    assert(math.abs(out(2L)._1 - 0.2505) < 1e-9)
    assert(math.abs(out(3L)._1 - 0.2505) < 1e-9)
    // ranks: ties broken by doc_id asc → d1=1, d4=2, d2=3, d3=4
    assert(out(1L)._2 == 1 && out(4L)._2 == 2 && out(2L)._2 == 3 && out(3L)._2 == 4)
  }

  test("per-subquery topK bounds candidate set before normalization") {
    val scored = Seq(
      (0L, 0, 1L, 10.0), (0L, 0, 2L, 8.0), (0L, 0, 3L, 6.0), (0L, 0, 4L, 4.0)
    ).toDF("query_id", "subq", "doc_id", "score")
    val out = HybridPipeline.run(
      scored, 1, NormalizationSpec.MinMax(), CombinationSpec.ArithmeticMean(),
      paginationDepth = Some(2), size = 10).collect()
    // only docs 1,2 survive the K-cut; min/max over {10,8}
    assert(out.map(_.getLong(1)).toSet == Set(1L, 2L))
  }

  test("validation: >5 subqueries, bad technique pair, weight mismatch") {
    intercept[IllegalArgumentException] {
      HybridValidation.validate(6, NormalizationSpec.MinMax(), CombinationSpec.ArithmeticMean(), None)
    }
    intercept[IllegalArgumentException] {
      HybridValidation.validate(2, NormalizationSpec.ZScore, CombinationSpec.GeometricMean(), None)
    }
    intercept[IllegalArgumentException] {
      HybridValidation.validate(2, NormalizationSpec.MinMax(), CombinationSpec.ArithmeticMean(Some(Seq(1.0))), None)
    }
    intercept[IllegalArgumentException] {
      HybridValidation.validate(1, NormalizationSpec.RRF(rankConstant = 60), CombinationSpec.RRF(), Some(20000))
    }
    // min_max bounds count must match subquery count (reference throws)
    val oneBound = Seq((ScoreBound.disabledLower, ScoreBound.disabledUpper))
    intercept[IllegalArgumentException] {
      HybridValidation.validate(2, NormalizationSpec.MinMax(oneBound), CombinationSpec.ArithmeticMean(), None)
    }
    HybridValidation.validate(1, NormalizationSpec.MinMax(oneBound), CombinationSpec.ArithmeticMean(), None)
  }

  test("searchAfterFields pages the multi-key order exactly, nulls in the tail") {
    import HybridPipeline.SortField
    // (doc_id, lang, n_chars, score): lang asc, n_chars desc, doc_id asc;
    // doc 6 has a NULL lang (sorts last), docs 2/3 tie on both keys
    val rows = Seq(
      (1L, "de", 50L, 0.9), (2L, "en", 70L, 0.8), (3L, "en", 70L, 0.7),
      (4L, "en", 40L, 0.6), (5L, "fr", 90L, 0.5), (6L, null.asInstanceOf[String], 99L, 0.4))
    val df = rows.toDF("doc_id", "lang", "n_chars", "score")
    val fields = Seq(SortField("lang", ascending = true), SortField("n_chars", ascending = false))
    val fullOrder = df
      .orderBy(col("lang").asc_nulls_last, col("n_chars").desc_nulls_last, col("doc_id").asc)
      .select("doc_id").as[Long].collect().toSeq
    assert(fullOrder == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // walk the whole relation page-by-page with size=2; concatenation must
    // reproduce the full order regardless of where cursors land
    var cursor: Option[(Any, Any, Long)] = None
    var walked = Seq.empty[Long]
    for (_ <- 0 until 3) {
      val page = cursor match {
        case None => df.orderBy(col("lang").asc_nulls_last,
          col("n_chars").desc_nulls_last, col("doc_id").asc).limit(2)
        case Some((l, n, d)) =>
          HybridPipeline.searchAfterFields(df, fields, Seq(l, n), d, size = 2)
      }
      val got = page.select("doc_id", "lang", "n_chars").collect()
      walked ++= got.map(_.getLong(0))
      val last = got.last
      cursor = Some((last.get(1), last.get(2), last.getLong(0)))
    }
    assert(walked == fullOrder)
    // null-lang cursor: only deeper ties advance — nothing after doc 6
    assert(HybridPipeline.searchAfterFields(df, fields, Seq(null, 99L), 6L).count() == 0)
    // cursor arity must match sort arity
    intercept[IllegalArgumentException] {
      HybridPipeline.searchAfterFields(df, fields, Seq("en"), 1L)
    }
  }

  test("runSortedFields multi-key equals single-key when keys collapse") {
    import HybridPipeline.SortField
    val docs = Seq(
      (1L, 0.9, 10L), (2L, 0.5, 30L), (3L, 0.7, 20L), (4L, 0.1, 40L)
    ).toDF("doc_id", "s0", "k")
    val scored = HybridPipeline.score(docs, col("doc_id"), Seq(col("s0")))
    val keys1 = docs.select(col("doc_id"), col("k").as("sort_key"))
    val keysM = docs.select(col("doc_id"), col("k"))
    val a = HybridPipeline.runSorted(scored, 1, NormalizationSpec.MinMax(),
      CombinationSpec.ArithmeticMean(), keys1, ascending = true, size = 3)
      .select("doc_id", "rank").as[(Long, Int)].collect().toSeq.sorted
    val b = HybridPipeline.runSortedFields(scored, 1, NormalizationSpec.MinMax(),
      CombinationSpec.ArithmeticMean(), keysM, Seq(SortField("k", ascending = true)), size = 3)
      .select("doc_id", "rank").as[(Long, Int)].collect().toSeq.sorted
    assert(a == b && a.map(_._1) == Seq(1L, 2L, 3L))
  }

  test("small collapse-key and sort-key relations plan as broadcast joins") {
    import HybridPipeline.SortField
    val docs = Seq(
      (1L, 0.9, "g1", 10L), (2L, 0.5, "g1", 30L), (3L, 0.7, "g2", 20L), (4L, 0.1, "g2", 40L)
    ).toDF("doc_id", "s0", "g", "k")
    val scored = HybridPipeline.score(docs, col("doc_id"), Seq(col("s0")))
    val collapseKeys = docs.select(col("doc_id"), col("g").as("collapse_key"))
    val collapsed = HybridPipeline.run(scored, 1, NormalizationSpec.MinMax(),
      CombinationSpec.ArithmeticMean(), size = 3,
      collapse = Some((collapseKeys, 1)))
    assert(collapsed.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "collapse-key join must broadcast a small key relation")
    val sortKeys = docs.select(col("doc_id"), col("k"))
    val sorted = HybridPipeline.runSortedFields(scored, 1, NormalizationSpec.MinMax(),
      CombinationSpec.ArithmeticMean(), sortKeys, Seq(SortField("k", ascending = true)), size = 3)
    assert(sorted.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "sort-key join must broadcast a small key relation")
  }
}
