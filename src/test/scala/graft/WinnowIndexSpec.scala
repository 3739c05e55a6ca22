package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, WinnowIndex}

/** Delta overlap detection against the written winnow index: output must
  * equal whole-corpus winnowPairs restricted to delta-touching pairs —
  * the q_dedup_winnow_delta oracle derivation contract. */
class WinnowIndexSpec extends SparkSpec {
  import spark.implicits._

  /** Docs sharing a verbatim passage per cluster (≥ w+k−1 = 7 tokens, so
    * winnowing guarantees a shared fingerprint) across split boundaries,
    * plus unique tails so docs are not exact duplicates. */
  private def corpus(n: Int) = (0 until n).map { i =>
    val cluster = i / 3
    (i.toLong,
      s"copied passage block $cluster one two three four five six seven " +
        s"eight nine ten unique tail ${i} " + ("filler " * (i % 4)))
  }.toDF("doc_id", "text")

  private def tmpPath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"wnidx_$tag").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("deltaPairs == whole-corpus winnowPairs restricted to delta-touching pairs") {
    val docs = corpus(36).persist()
    val base = docs.where(col("doc_id") % 3 =!= 0)
    val delta = docs.where(col("doc_id") % 3 === 0)
    val path = tmpPath("eq")
    WinnowIndex.write(base, path, k = 4, w = 4)
    val got = asSet(WinnowIndex.deltaPairs(spark, path, delta, minShared = 2))
    val full = Dedup.winnowPairs(docs, k = 4, w = 4, minShared = 2)
      .where(col("id_a") % 3 === 0 || col("id_b") % 3 === 0)
    assert(got == asSet(full))
    assert(got.exists { case (a, b, _) => a % 3 == 0 ^ b % 3 == 0 }) // old×new
    assert(got.exists { case (a, b, _) => a % 3 == 0 && b % 3 == 0 }) // new×new
    docs.unpersist()
  }

  test("maxDf caps on the COMBINED (index + delta) fingerprint df") {
    // boilerplate-ish: shared footer makes corpus-hot fingerprints whose
    // combined df exceeds the cap only when BOTH splits are counted
    val docs = (0 until 24).map { i =>
      (i.toLong, s"distinct opening run number ${i} alpha beta gamma delta " +
        "shared footer all rights reserved standard terms apply here")
    }.toDF("doc_id", "text").persist()
    val base = docs.where(col("doc_id") % 4 =!= 0)
    val delta = docs.where(col("doc_id") % 4 === 0)
    val path = tmpPath("cap")
    WinnowIndex.write(base, path, k = 4, w = 4)
    val got = asSet(WinnowIndex.deltaPairs(spark, path, delta,
      minShared = 1, maxDf = Some(10)))
    val full = Dedup.winnowPairs(docs, k = 4, w = 4, minShared = 1,
      maxDf = Some(10))
      .where(col("id_a") % 4 === 0 || col("id_b") % 4 === 0)
    assert(got == asSet(full))
    docs.unpersist()
  }

  test("append folds a batch in; meta mismatch is impossible by construction") {
    val docs = corpus(36).persist()
    val path = tmpPath("app")
    WinnowIndex.write(docs.where(col("doc_id") % 3 === 1), path, k = 4, w = 4)
    WinnowIndex.append(docs.where(col("doc_id") % 3 === 2), path)
    val got = asSet(WinnowIndex.deltaPairs(spark, path,
      docs.where(col("doc_id") % 3 === 0), minShared = 2))
    val full = Dedup.winnowPairs(docs, k = 4, w = 4, minShared = 2)
      .where(col("id_a") % 3 === 0 || col("id_b") % 3 === 0)
    assert(got == asSet(full))
    assert(WinnowIndex.readMeta(path) == WinnowIndex.Meta(4, 4, nPart = 8))
    docs.unpersist()
  }
}
