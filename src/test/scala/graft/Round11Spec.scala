package graft

import org.apache.spark.sql.functions._

import graft.ann.Ann
import graft.dedup.Dedup
import graft.ml.ModelClient

/** Conf-install fixtures for ModelRegistry.clientFromConf (must be
  * top-level: Class.forName resolves them by name). */
object ConfFakeObjectClient extends ModelClient {
  def embedDense(text: String, dim: Int): Array[Float] = Array.fill(dim)(7f)
  def encodeSparse(text: String): Map[String, Float] = Map("t" -> 7f)
  def embedMultimodal(text: String, imageB64: String, dim: Int): Array[Float] =
    Array.fill(dim)(7f)
  def similarity(query: String, passage: String, dim: Int): Float = 7f
  def spanScore(query: String, window: String, dim: Int): Double = 7.0
}
class ConfFakeClassClient extends ModelClient {
  def embedDense(text: String, dim: Int): Array[Float] = Array.fill(dim)(9f)
  def encodeSparse(text: String): Map[String, Float] = Map("t" -> 9f)
  def embedMultimodal(text: String, imageB64: String, dim: Int): Array[Float] =
    Array.fill(dim)(9f)
  def similarity(query: String, passage: String, dim: Int): Float = 9f
  def spanScore(query: String, window: String, dim: Int): Double = 9.0
}

/** Round-11 additions: probe-scaled SemDeDup (the scale-safe nlist
  * configuration) and the null-embedding contract fix. */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  /** 12 vectors in 3 obvious 4-member bundles (unit axes with tiny noise)
    * plus two degenerate rows: a null embedding and a wrong-dimension one. */
  private def vecs(dim: Int = 8) = {
    def axis(a: Int, eps: Float) = {
      val v = Array.fill(dim)(0f); v(a) = 1f; v((a + 1) % dim) = eps; v.toSeq
    }
    val good = (0 until 12).map { i =>
      (i.toLong, axis(i % 3, 0.01f * (i / 3)))
    }
    (good :+ (100L, null.asInstanceOf[Seq[Float]]) :+ (101L, Seq(1f, 2f)))
      .toDF("vec_id", "embedding")
  }

  test("seededCentroids: prefix-stable in nlist under one seed (the scaled-oracle protocol)") {
    val small = Ann.seededCentroids(nlist = 8, dim = 64)
    val big = Ann.seededCentroids(nlist = 64, dim = 64)
    assert(big.take(8).map(_.toSeq).toSeq == small.map(_.toSeq).toSeq)
    // and across dim the streams DIVERGE — the property is nlist-prefix
    // only, which is all the oracle relies on
    assert(Ann.seededCentroids(4, 8)(1).toSeq != Ann.seededCentroids(4, 16)(1).take(8).toSeq)
  }

  test("semanticNlist: clamp(ceil(n/target), min, max)") {
    assert(Dedup.semanticNlist(0L, 20, 8, 64) == 8)
    assert(Dedup.semanticNlist(500L, 20, 8, 64) == 25)
    assert(Dedup.semanticNlist(10000L, 20, 8, 64) == 64)
    assert(Dedup.semanticNlist(501L, 20, 8, 64) == 26) // ceil, not round
    assertThrows[IllegalArgumentException](Dedup.semanticNlist(1L, 0, 8, 64))
  }

  test("semanticDedup: null/mis-dim vectors are singleton keepers in BOTH dispatch branches") {
    for (nlist <- Seq(8, 17)) { // inline argmax vs broadcast-join argmax
      val out = Dedup.semanticDedup(vecs(), dim = 8, nlist = nlist, threshold = 0.9)
        .orderBy(col("vec_id"))
        .as[(Long, Long, Boolean)].collect()
      assert(out.length == 14, s"one row per input vector (nlist=$nlist)")
      val degen = out.filter(r => r._1 >= 100L)
      assert(degen.toSeq == Seq((100L, 100L, true), (101L, 101L, true)),
        s"degenerate rows are singleton keepers (nlist=$nlist)")
      // the valid rows still deduplicate: 3 bundles -> 3 keepers
      assert(out.filter(r => r._1 < 100L && r._3).length == 3)
    }
  }

  // -------------------------------------------- ModelRegistry conf seam

  test("ModelRegistry.clientFromConf: resolves object and class client forms, rejects junk") {
    import graft.ml.ModelRegistry
    def confOf(name: String) =
      new org.apache.spark.SparkConf(false).set(ModelRegistry.ClientConfKey, name)
    // no key set -> no override
    assert(ModelRegistry.clientFromConf(new org.apache.spark.SparkConf(false)).isEmpty)
    // Scala object by plain name (the cluster --conf form)
    val obj = ModelRegistry.clientFromConf(confOf("graft.ConfFakeObjectClient"))
    assert(obj.exists(_.embedDense("x", 2).toSeq == Seq(7f, 7f)))
    // no-arg-constructor class
    val cls = ModelRegistry.clientFromConf(confOf(classOf[ConfFakeClassClient].getName))
    assert(cls.exists(_.embedDense("x", 3).toSeq == Seq(9f, 9f, 9f)))
    // fails LOUD: a cluster that asked for a real model must not silently
    // fall back to the hash stand-in
    assertThrows[ClassNotFoundException](
      ModelRegistry.clientFromConf(confOf("graft.NoSuchClient")).get)
    assertThrows[IllegalArgumentException](
      ModelRegistry.clientFromConf(confOf("java.lang.Object")).get)
  }

  test("ModelRegistry.withClient: nested swap fails loud; scoped swap routes executor-side UDFs") {
    import graft.ml.{HashModelClient, ModelRegistry}
    assertThrows[IllegalStateException] {
      ModelRegistry.withClient(HashModelClient) {
        ModelRegistry.withClient(HashModelClient) { () }
      }
    }
    // after the failed nesting, the depth guard must have unwound
    val out = ModelRegistry.withClient(graft.ConfFakeObjectClient) {
      // FORCE evaluation inside the scope (the documented contract): the
      // UDF runs on task threads, which resolve current at call time
      val f = org.apache.spark.sql.functions.udf((s: String) =>
        graft.ml.ModelRegistry.current.embedDense(s, 2))
      Seq("a", "b").toDF("t").select(f(col("t")).as("v")).collect()
    }
    assert(out.forall(_.getSeq[Float](0) == Seq(7f, 7f)))
  }

  // --------------------------------------- batch-serving chunk contract

  test("scoreBatchSparse: chunked execution equals the single-join form exactly") {
    import graft.exec.HybridPipeline
    val postings = Seq(
      (1L, "a", 2f), (1L, "b", 1f), (2L, "a", 3f), (2L, "c", 2f),
      (3L, "c", 1f), (3L, "b", 4f)).toDF("doc_id", "token", "weight")
    val queries = (0L until 7L).map { q =>
      q -> Seq(Map("a" -> 1f, "c" -> (q + 1).toFloat), Map("b" -> 0.5f))
    }.toMap
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy(col("query_id"), col("subq"), col("doc_id"))
      .collect().toSeq
    val full = rows(HybridPipeline.scoreBatchSparse(postings, queries))
    assert(full.nonEmpty)
    // chunkSize 2 -> 4 chunks over 7 queries; must be row-identical
    assert(rows(HybridPipeline.scoreBatchSparse(postings, queries, chunkSize = 2)) == full)
    // chunkSize 1 degenerates to per-query joins; still identical
    assert(rows(HybridPipeline.scoreBatchSparse(postings, queries, chunkSize = 1)) == full)
    // 0 = auto (sweep-fit clamp(batch/5, 500, 4000)); negatives reject
    assert(rows(HybridPipeline.scoreBatchSparse(postings, queries, chunkSize = 0)) == full)
    assert(HybridPipeline.autoChunkSize(1000) == 500 &&
      HybridPipeline.autoChunkSize(10000) == 2000 &&
      HybridPipeline.autoChunkSize(100000) == 4000)
    assertThrows[IllegalArgumentException](
      HybridPipeline.scoreBatchSparse(postings, queries, chunkSize = -1))
  }

  // ------------------------------------------- winnow collapse + auto

  /** Reference winnow pair counts computed the naive way (explode →
    * self-join → count), deliberately bypassing the collapse machinery. */
  private def naiveWinnowPairs(docs: org.apache.spark.sql.DataFrame,
      minShared: Int, maxDf: Option[Int]): Seq[(Long, Long, Long)] = {
    val fp0 = docs.select(col("doc_id").cast("long").as("id"),
        explode(udf((s: String) => Dedup.winnowFingerprints(s, 4, 4))
          .apply(col("text"))).as("f"))
      .select(col("id"), col("f._2").as("gh")).distinct()
    val fp = maxDf match {
      case Some(cap) => fp0.join(
        fp0.groupBy(col("gh")).agg(count(lit(1)).as("__df"))
          .where(col("__df") <= cap).select(col("gh")), "gh")
      case None => fp0
    }
    fp.as("a").join(fp.as("b"), Seq("gh"))
      .where(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .orderBy(col("id_a"), col("id_b"))
      .as[(Long, Long, Long)].collect().toSeq
  }

  /** 6 distinct docs, two of them verbatim-replicated (3× and 2×) plus a
    * short doc with no fingerprints — exercises within-group, cross-group,
    * and singleton paths of the duplicate-set collapse. */
  private def dupDocs = {
    val base = Seq(
      "the quick brown fox jumps over the lazy dog near the river bank today",
      "a completely different document about spark catalyst optimizer rules and plans",
      "the quick brown fox jumps over the lazy dog near the river bank today and more",
      "winnowing selects minimum hashes from each window of consecutive gram hashes always",
      "shared boilerplate footer terms apply to every document in this corpus forever",
      "tiny")
    val docs = base.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      Seq((10L, base(0)), (11L, base(0)), (12L, base(2)))
    docs.toDF("doc_id", "text")
  }

  test("winnowPairs: duplicate-set collapse equals the naive form (uncapped, capped, minShared)") {
    def run(minShared: Int, maxDf: Option[Int]) = {
      val got = Dedup.winnowPairs(dupDocs, k = 4, w = 4,
          minShared = minShared, maxDf = maxDf)
        .orderBy(col("id_a"), col("id_b"))
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == naiveWinnowPairs(dupDocs, minShared, maxDf),
        s"minShared=$minShared maxDf=$maxDf")
      got
    }
    val uncapped = run(1, None)
    // the replicas must pair with each other (within-group) AND with their
    // near-dup siblings (cross-group inheritance)
    assert(uncapped.exists(p => p._1 == 0L && p._2 == 10L))
    assert(uncapped.exists(p => p._1 == 10L && p._2 == 11L))
    assert(uncapped.exists(p => p._1 == 2L && p._2 == 10L) ||
      uncapped.exists(p => p._1 == 0L && p._2 == 2L))
    run(2, None)
    // cap at 2: fingerprints in >2 docs (the 0/10/11/2/12 shared run) drop
    run(1, Some(2))
    run(2, Some(2))
    // duplicate-free corpus exercises the probe's skip branch
    val plain = dupDocs.where(col("doc_id") < 6)
    assert(Dedup.winnowPairs(plain, k = 4, w = 4, minShared = 1)
      .orderBy(col("id_a"), col("id_b"))
      .as[(Long, Long, Long)].collect().toSeq ==
      naiveWinnowPairs(plain, 1, None))
  }

  test("winnowStrategy/auto: dispatch pinned per regime; auto equals the dispatched form") {
    // plain corpus: candidate volume within budget -> uncapped
    val plain = dupDocs.where(col("doc_id") < 6)
    assert(Dedup.winnowStrategy(plain, k = 4, w = 4) == "uncapped")
    // boilerplate regime: a hot shared footer in EVERY doc, distinct
    // bodies; tight budget + low cap force the capped call
    val boiler = (0L until 40L).map { i =>
      val body = (0 until 40).map(j => s"w${i}x$j").mkString(" ")
      (i, s"$body standard corpus footer terms apply all rights reserved forever")
    }.toDF("doc_id", "text")
    val (stratB, outB) = Dedup.winnowPairsAutoWithStrategy(boiler,
      k = 4, w = 4, minShared = 1, cap = 10, budgetPerDoc = 2L)
    assert(stratB == "capped")
    assert(outB.orderBy(col("id_a"), col("id_b"))
      .as[(Long, Long, Long)].collect().toSeq ==
      naiveWinnowPairs(boiler, 1, Some(10)))
    // auto on the plain corpus = the exact uncapped relation
    val (stratP, outP) = Dedup.winnowPairsAutoWithStrategy(plain,
      k = 4, w = 4, minShared = 1)
    assert(stratP == "uncapped")
    assert(outP.orderBy(col("id_a"), col("id_b"))
      .as[(Long, Long, Long)].collect().toSeq ==
      naiveWinnowPairs(plain, 1, None))
  }

  test("semanticDedupAuto: probe picks the formula nlist and matches the manual call") {
    val df = vecs().where(col("vec_id") < 100) // 12 valid rows
    val auto = Dedup.semanticDedupAuto(df, dim = 8, targetCluster = 4,
      threshold = 0.9, minNlist = 2, maxNlist = 64)
      .orderBy(col("vec_id")).collect()
    val manual = Dedup.semanticDedup(df, dim = 8, nlist = 3, threshold = 0.9)
      .orderBy(col("vec_id")).collect() // ceil(12/4) = 3
    assert(auto.toSeq == manual.toSeq)
  }

  test("resolveClustersIncremental == batch CC for arbitrary pair splits") {
    // adversarial component shapes: a long chain (merged only by late
    // pairs), a star, cross-split merges of two previously-separate
    // clusters, and singletons
    val allPairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), // chain
      (10L, 11L), (10L, 12L), (10L, 13L),     // star
      (20L, 21L), (22L, 23L), (21L, 22L),     // two clusters merged by (21,22)
      (30L, 31L))
    val ids = (1L to 5L) ++ Seq(10L, 11L, 12L, 13L, 20L, 21L, 22L, 23L, 30L, 31L, 40L)
    val allIds = ids.toDF("id")
    val batch = Dedup.resolveClusters(allPairs.toDF("id_a", "id_b"), allIds)
      .orderBy(col("id")).as[(Long, Long)].collect().toSeq
    // every 2^10 bitmask split of the pair set must reproduce the batch
    // assignment through the incremental path (sampled: all 16 splits of
    // the first 4 pairs x 3 fixed masks of the rest keeps runtime sane)
    val masks = Seq(0, 0x155, 0x3ff).flatMap(hi => (0 until 16).map(lo => (hi & ~0xf) | lo))
    masks.distinct.foreach { m =>
      val (e2, e1) = allPairs.zipWithIndex.partition { case (_, i) => ((m >> i) & 1) == 1 }
      val prevIds = ids.toSet -- e2.flatMap(p => Seq(p._1._1, p._1._2))
      val prev = Dedup.resolveClusters(e1.map(_._1).toDF("id_a", "id_b"),
        prevIds.toSeq.toDF("id"))
      val inc = Dedup.resolveClustersIncremental(prev,
        e2.map(_._1).toDF("id_a", "id_b"), allIds)
        .orderBy(col("id")).as[(Long, Long)].collect().toSeq
      assert(inc == batch, s"split mask $m diverged")
    }
  }
}
