package graft

import org.apache.spark.sql.functions._

import graft.ann.Ann
import graft.dedup.Dedup

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

  test("semanticDedupAuto: probe picks the formula nlist and matches the manual call") {
    val df = vecs().where(col("vec_id") < 100) // 12 valid rows
    val auto = Dedup.semanticDedupAuto(df, dim = 8, targetCluster = 4,
      threshold = 0.9, minNlist = 2, maxNlist = 64)
      .orderBy(col("vec_id")).collect()
    val manual = Dedup.semanticDedup(df, dim = 8, nlist = 3, threshold = 0.9)
      .orderBy(col("vec_id")).collect() // ceil(12/4) = 3
    assert(auto.toSeq == manual.toSeq)
  }
}
