package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.dedup.Dedup
import graft.exec.{HybridPipeline, Normalization}
import graft.functions.VectorExpressions
import graft.model._

/** Degenerate inputs: empty corpora, no-match queries, singleton sets —
  * operators must return empty/identity results, never throw. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emptyDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val emptyEmb =
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  test("hybrid pipeline on an empty scored relation returns no rows") {
    val scored = Seq.empty[(Long, Int, Long, Double)]
      .toDF("query_id", "subq", "doc_id", "score")
    val out = HybridPipeline.run(scored, 2, NormalizationSpec.MinMax(),
      CombinationSpec.ArithmeticMean())
    assert(out.count() == 0)
  }

  test("normalization techniques on empty input return empty") {
    val rel = Seq.empty[(Long, Int, Long, Double)]
      .toDF("query_id", "subq", "doc_id", "score")
    assert(Normalization.minMax(rel).count() == 0)
    assert(Normalization.l2(rel).count() == 0)
    assert(Normalization.zScore(rel).count() == 0)
    assert(Normalization.rrf(rel).count() == 0)
  }

  test("dedup family on an empty corpus returns no pairs/groups") {
    assert(Dedup.exact(emptyDocs).count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs).count() == 0)
    assert(Dedup.minhashLsh(emptyDocs).count() == 0)
    assert(Dedup.minhashLsh(emptyDocs, maxBucket = Some(10)).count() == 0)
    assert(Dedup.simhashPairs(emptyDocs).count() == 0)
    // the probe on an empty corpus dispatches uncapped (0 ≤ any budget)
    assert(Dedup.ngramStrategy(emptyDocs) == "uncapped")
    assert(Dedup.ngramJaccardAuto(emptyDocs).count() == 0)
    assert(Dedup.semanticDedup(emptyEmb, dim = 64).count() == 0)
  }

  test("single-doc corpus: auto dispatch and semantic dedup are identity-shaped") {
    val one = Seq((7L, "alpha beta gamma delta")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardAuto(one).count() == 0) // no pair to emit
    val oneVec = Seq((3L, Array.fill(64)(0.5f))).toDF("vec_id", "embedding")
    val sem = Dedup.semanticDedup(oneVec, dim = 64).head()
    assert(sem.getLong(0) == 3L && sem.getLong(1) == 3L && sem.getBoolean(2))
  }

  test("scoreBatchSparse: empty postings yields empty; empty query map throws") {
    val emptyPostings = Seq.empty[(Long, String, Float)]
      .toDF("doc_id", "token", "weight")
    assert(HybridPipeline.scoreBatchSparse(emptyPostings,
      Map(0L -> Seq(Map("x" -> 1f)))).count() == 0)
    intercept[IllegalArgumentException] {
      HybridPipeline.scoreBatchSparse(emptyPostings, Map.empty)
    }
  }

  test("resolveClusters with no pairs labels everyone a singleton (both paths)") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val ids = (1L to 5L).toDF("id")
    val drv = Dedup.resolveClusters(pairs, ids).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(drv == (1L to 5L).map(i => i -> i).toMap)
    val dist = Dedup.resolveClusters(pairs, ids, driverCutoff = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == drv)
  }

  test("ANN brute force on empty embeddings returns no rows") {
    assert(Ann.bruteForceTopK(emptyEmb, Array(1f, 0f), 10).count() == 0)
  }

  test("no-match sparse query yields empty results through the pipeline") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
      .withColumn("tokens", SparkEntry.encodeUdf(col("text")))
    val q = graft.ml.HashEmbedder.encode("zeta omega")
    val sc = round(VectorExpressions.sparse_dot(col("tokens"), typedLit(q)), 6)
    val scored = HybridPipeline.score(docs, col("doc_id"), Seq(when(sc > 0.0, sc)))
    val out = HybridPipeline.run(scored, 1, NormalizationSpec.MinMax(),
      CombinationSpec.ArithmeticMean())
    assert(out.count() == 0)
  }

  test("single-doc corpus: min_max gives 1.0, hybrid returns rank 1") {
    val docs = Seq((7L, "alpha beta")).toDF("doc_id", "text")
      .withColumn("tokens", SparkEntry.encodeUdf(col("text")))
    val q = graft.ml.HashEmbedder.encode("alpha")
    val sc = round(VectorExpressions.sparse_dot(col("tokens"), typedLit(q)), 6)
    val scored = HybridPipeline.score(docs, col("doc_id"), Seq(when(sc > 0.0, sc)))
    val out = HybridPipeline.run(scored, 1, NormalizationSpec.MinMax(),
      CombinationSpec.ArithmeticMean()).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("score") == 1.0)
    assert(out(0).getAs[Int]("rank") == 1)
  }
}
