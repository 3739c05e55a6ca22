package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, EmbeddingIndex}

/** Delta semantic dedup against the written embedding index: output must
  * equal whole-corpus embeddingNearDupLsh restricted to delta-touching
  * pairs — the q_dedup_embedding_delta oracle derivation contract. */
class EmbeddingIndexSpec extends SparkSpec {
  import spark.implicits._

  /** Bundles of near-identical vectors (unit axes + small noise) whose
    * members cross the base/delta split, plus a zero vector. */
  private def vecs(n: Int, dim: Int = 16) = (0 until n).map { i =>
    val v = Array.fill(dim)(0f)
    if (i < n - 1) { v(i % 4) = 1f; v((i % 4) + 4) = 0.02f * (i / 4) }
    (i.toLong, v.toSeq)
  }.toDF("vec_id", "embedding")

  private def tmpPath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"embidx_$tag").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("deltaPairs == whole-corpus embeddingNearDupLsh restricted to delta-touching pairs") {
    val all = vecs(24).persist()
    val base = all.where(col("vec_id") % 3 =!= 0)
    val delta = all.where(col("vec_id") % 3 === 0)
    val path = tmpPath("eq")
    EmbeddingIndex.write(base, path, dim = 16, nbits = 4, tables = 8)
    val got = asSet(EmbeddingIndex.deltaPairs(spark, path, delta, threshold = 0.9))
    val full = Dedup.embeddingNearDupLsh(all, dim = 16, threshold = 0.9,
      nbits = 4, tables = 8)
      .where(col("id_a") % 3 === 0 || col("id_b") % 3 === 0)
    assert(got == asSet(full))
    assert(got.exists { case (a, b, _) => a % 3 == 0 ^ b % 3 == 0 }) // old×new
    assert(got.exists { case (a, b, _) => a % 3 == 0 && b % 3 == 0 }) // new×new
    all.unpersist()
  }

  test("duplicate-vector regime: delta equality holds when batch takes the collapse branch") {
    // verbatim-duplicated vectors force embeddingNearDupLsh's rep-collapse
    // branch; the delta path must still match its output
    val all = vecs(12).unionByName(
      vecs(12).withColumn("vec_id", col("vec_id") + 100)).persist()
    val base = all.where(col("vec_id") % 2 === 1)
    val delta = all.where(col("vec_id") % 2 === 0)
    val path = tmpPath("dup")
    EmbeddingIndex.write(base, path, dim = 16, nbits = 4, tables = 8)
    val got = asSet(EmbeddingIndex.deltaPairs(spark, path, delta, threshold = 0.9))
    val full = Dedup.embeddingNearDupLsh(all, dim = 16, threshold = 0.9,
      nbits = 4, tables = 8)
      .where(col("id_a") % 2 === 0 || col("id_b") % 2 === 0)
    assert(got == asSet(full))
    all.unpersist()
  }

  test("append folds a batch in; meta mismatch impossible by construction") {
    val all = vecs(24).persist()
    val path = tmpPath("app")
    EmbeddingIndex.write(all.where(col("vec_id") % 3 === 1), path,
      dim = 16, nbits = 4, tables = 8)
    EmbeddingIndex.append(all.where(col("vec_id") % 3 === 2), path)
    val got = asSet(EmbeddingIndex.deltaPairs(spark, path,
      all.where(col("vec_id") % 3 === 0), threshold = 0.9))
    val full = Dedup.embeddingNearDupLsh(all, dim = 16, threshold = 0.9,
      nbits = 4, tables = 8)
      .where(col("id_a") % 3 === 0 || col("id_b") % 3 === 0)
    assert(got == asSet(full))
    assert(EmbeddingIndex.readMeta(path) == EmbeddingIndex.Meta(16, 4, 8, 42L, nPart = 8))
    all.unpersist()
  }
}
