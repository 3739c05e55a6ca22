package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, MinhashIndex}

/** Delta dedup against the written MinHash index: output must equal the
  * whole-corpus minhashLsh restricted to pairs touching the delta — the
  * contract the q_dedup_minhash_delta oracle derivation relies on. */
class MinhashIndexSpec extends SparkSpec {
  import spark.implicits._

  // partitioned layouts nest files under pb=*/ dirs — count recursively
  private def parquetFiles(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(dir))
  }

  /** Corpus with near-dup pairs crossing every split boundary: clusters of
    * verbatim-ish copies whose members land in base (id % 3 != 0) and
    * delta (id % 3 == 0), plus unique chaff. */
  private def corpus(n: Int) = (0 until n).map { i =>
    val cluster = i / 3
    val body = s"the quick brown fox number $cluster jumps over the lazy dog " +
      s"and then walks around the block ${if (i % 3 == 2) "slowly today" else "quickly"}"
    (i.toLong, body)
  }.toDF("doc_id", "text")

  private def tmpPath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"mhidx_$tag").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("deltaPairs == whole-corpus minhashLsh restricted to delta-touching pairs") {
    val docs = corpus(60).persist()
    val base = docs.where(col("doc_id") % 3 =!= 0)
    val delta = docs.where(col("doc_id") % 3 === 0)
    val path = tmpPath("eq")
    MinhashIndex.write(base, path)
    val got = asSet(MinhashIndex.deltaPairs(spark, path, delta, threshold = 0.5))
    val full = Dedup.minhashLsh(docs, threshold = 0.5)
      .where(col("id_a") % 3 === 0 || col("id_b") % 3 === 0)
    assert(got == asSet(full))
    assert(got.nonEmpty) // fixture sanity: cross-split near-dups exist
    assert(got.exists { case (a, b, _) => a % 3 == 0 ^ b % 3 == 0 }) // old×new
    assert(got.exists { case (a, b, _) => a % 3 == 0 && b % 3 == 0 }) // new×new
    docs.unpersist()
  }

  test("maxBucket caps on base+delta bucket population, matching minhashLsh") {
    // boilerplate-ish corpus: a shared footer drives hot buckets
    val docs = (0 until 48).map { i =>
      (i.toLong, s"unique lead token$i here " +
        "shared footer text that every single document carries verbatim always")
    }.toDF("doc_id", "text").persist()
    val base = docs.where(col("doc_id") % 4 =!= 0)
    val delta = docs.where(col("doc_id") % 4 === 0)
    val path = tmpPath("cap")
    MinhashIndex.write(base, path)
    val got = asSet(MinhashIndex.deltaPairs(spark, path, delta,
      threshold = 0.3, maxBucket = Some(8)))
    val full = Dedup.minhashLsh(docs, threshold = 0.3, maxBucket = Some(8))
      .where(col("id_a") % 4 === 0 || col("id_b") % 4 === 0)
    assert(got == asSet(full))
    docs.unpersist()
  }

  test("append folds a batch in: the next delta is checked against it") {
    val docs = corpus(60).persist()
    val base = docs.where(col("doc_id") % 3 === 1)
    val d1 = docs.where(col("doc_id") % 3 === 2)
    val d2 = docs.where(col("doc_id") % 3 === 0)
    val path = tmpPath("app")
    MinhashIndex.write(base, path)
    MinhashIndex.append(d1, path)
    val got = asSet(MinhashIndex.deltaPairs(spark, path, d2, threshold = 0.5))
    val full = Dedup.minhashLsh(docs, threshold = 0.5)
      .where(col("id_a") % 3 === 0 || col("id_b") % 3 === 0)
    assert(got == asSet(full))
    // d1×d2 pairs specifically exist (the appended batch participates)
    assert(got.exists { case (a, b, _) =>
      (a % 3 == 2 && b % 3 == 0) || (a % 3 == 0 && b % 3 == 2) })
    docs.unpersist()
  }

  test("empty delta yields an empty, correctly-typed relation") {
    val docs = corpus(12)
    val path = tmpPath("empty")
    MinhashIndex.write(docs, path)
    val out = MinhashIndex.deltaPairs(spark, path, docs.limit(0), threshold = 0.5)
    assert(out.columns.toSeq == Seq("id_a", "id_b", "jaccard"))
    assert(out.count() == 0)
  }

  test("ingestStream from an empty index == whole-corpus minhashLsh (batching-invariant)") {
    val docs = corpus(30).persist()
    // stage the corpus as 3 parquet files + maxFilesPerTrigger=1 so the
    // stream runs as 3 genuine micro-batches, not one degenerate batch
    val srcDir = tmpPath("src")
    docs.repartition(3).write.mode("overwrite").parquet(srcDir)
    val root = tmpPath("stream")
    val idx = s"$root/index"
    val out = s"$root/pairs"
    MinhashIndex.write(docs.limit(0), idx)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    MinhashIndex.ingestStream(stream, idx, out, threshold = 0.5)
    val nBatches = parquetFiles(s"$idx/postings")
    assert(nBatches >= 3) // the appends really arrived batch by batch
    val got = asSet(spark.read.parquet(out).dropDuplicates("id_a", "id_b"))
    assert(got == asSet(Dedup.minhashLsh(docs, threshold = 0.5)))
    assert(got.nonEmpty)
    docs.unpersist()
  }

  test("meta round-trips and deltaPairs refuses a missing index") {
    val path = tmpPath("meta")
    MinhashIndex.write(corpus(6), path, shingleSize = 2, numHashes = 16,
      bands = 4, seed = 7L)
    assert(MinhashIndex.readMeta(path) == MinhashIndex.Meta(2, 16, 4, 7L, nPart = 8))
    assertThrows[Exception](
      MinhashIndex.deltaPairs(spark, tmpPath("nothere"), corpus(3)))
  }
}
