package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Written embedding near-duplicate index + delta search — the third leg
  * of the incremental-ingest dedup family ([[MinhashIndex]]: token-level
  * approximate, [[WinnowIndex]]: substring-level exact, this: semantic).
  * An arriving batch of vectors is checked against the indexed corpus for
  * cosine near-duplicates via the same seeded random-hyperplane LSH as
  * [[Dedup.embeddingNearDupLsh]] — candidates share a full nbits
  * signature in ≥ 1 table, verification is exact cosine.
  *
  * Layout under `path`: `EMB_META` (dim/nbits/tables/seed — a delta can
  * never be bucketed with different planes than the index), `postings/` —
  * (table, bucket, id), and `sketches/` — (id, v), the verification
  * vectors (the payload an embedding index inherently stores; at 64-dim
  * float that is 256 B/vector).
  *
  * Scale shape of [[deltaPairs]]: identical to [[MinhashIndex.deltaPairs]]
  * — the delta's buckets and the candidate set broadcast; the index
  * postings and sketches are each scanned ONCE and never shuffled. */
object EmbeddingIndex {

  final case class Meta(dim: Int, nbits: Int, tables: Int, seed: Long)

  private def metaFile(path: String) = new java.io.File(path, "EMB_META")

  private def writeMeta(path: String, m: Meta): Unit = {
    new java.io.File(path).mkdirs()
    val tmp = new java.io.File(path, ".EMB_META.tmp")
    java.nio.file.Files.write(tmp.toPath,
      s"${m.dim} ${m.nbits} ${m.tables} ${m.seed}".getBytes)
    java.nio.file.Files.move(tmp.toPath, metaFile(path).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def readMeta(path: String): Meta = {
    val parts = new String(java.nio.file.Files.readAllBytes(metaFile(path).toPath))
      .trim.split("\\s+")
    Meta(parts(0).toInt, parts(1).toInt, parts(2).toInt, parts(3).toLong)
  }

  private def postingsDir(path: String) = s"$path/postings"
  private def sketchesDir(path: String) = s"$path/sketches"

  /** (sketches, postings) under `m` — the SAME seeded planes and bucket
    * expression as embeddingNearDupLsh, so index and ad-hoc buckets are
    * interchangeable. Row-local; no shuffle. */
  private def sketchAndBucket(df: DataFrame, vecCol: String, idCol: String,
      m: Meta): (DataFrame, DataFrame) = {
    val planes = Dedup.lshPlanes(m.tables, m.nbits, m.dim, m.seed)
    val keyed = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val postings = keyed
      .select(col("id"),
        posexplode(Dedup.lshBucketCol(col("v"), planes)).as(Seq("table", "bucket")))
      .select(col("table"), col("bucket"), col("id"))
    (keyed.select(col("id"), col("v")), postings)
  }

  def write(df: DataFrame, path: String, vecCol: String = "embedding",
      idCol: String = "vec_id", dim: Int = 64, nbits: Int = 8,
      tables: Int = 4, seed: Long = 42L): Unit = {
    val m = Meta(dim, nbits, tables, seed)
    val (sketches, postings) = sketchAndBucket(df, vecCol, idCol, m)
    sketches.write.mode("overwrite").parquet(sketchesDir(path))
    postings.write.mode("overwrite").parquet(postingsDir(path))
    writeMeta(path, m)
  }

  /** Fold a (checked) batch of vectors in for the next delta. */
  def append(delta: DataFrame, path: String, vecCol: String = "embedding",
      idCol: String = "vec_id"): Unit = {
    val (sketches, postings) = sketchAndBucket(delta, vecCol, idCol, readMeta(path))
    sketches.write.mode("append").parquet(sketchesDir(path))
    postings.write.mode("append").parquet(postingsDir(path))
  }

  /** Cosine near-dup pairs (id_a < id_b, cosine ≥ threshold) touching the
    * delta: old×new from the postings join, new×new from the delta's own
    * buckets — never old×old. Output equals
    * `embeddingNearDupLsh(base ∪ delta)` restricted to pairs with a delta
    * side (spec-pinned); cosine math mirrors it exactly (zero-norm sides
    * score 0.0, round to 6 dp before the threshold). */
  def deltaPairs(spark: SparkSession, path: String, delta: DataFrame,
      vecCol: String = "embedding", idCol: String = "vec_id",
      threshold: Double = 0.95): DataFrame = {
    val m = readMeta(path)
    val postings = spark.read.parquet(postingsDir(path))
    val sketches = spark.read.parquet(sketchesDir(path))
    val (dSk0, dPo0) = sketchAndBucket(delta, vecCol, idCol, m)
    val dSk = dSk0.persist()
    val dPo = dPo0.persist()
    dPo.count() // the bucket UDF runs once, not per consumer

    val oldNew = postings
      .join(broadcast(dPo.select(col("table"), col("bucket")).distinct()),
        Seq("table", "bucket"))
      .select(col("table"), col("bucket"), col("id").as("id_old"))
      .join(broadcast(dPo.select(col("table"), col("bucket"), col("id").as("id_new"))),
        Seq("table", "bucket"))
      .where(col("id_old") =!= col("id_new"))
      .select(least(col("id_old"), col("id_new")).as("id_a"),
        greatest(col("id_old"), col("id_new")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val newNew = Dedup.bucketPairsPublic(dPo, Seq("table", "bucket"))
    val cand = oldNew.unionByName(newNew).dropDuplicates("id_a", "id_b").persist()
    cand.count()

    val candIds = cand.select(col("id_a").as("id"))
      .unionByName(cand.select(col("id_b").as("id"))).distinct()
    val rel = sketches.unionByName(dSk)
      .join(broadcast(candIds), Seq("id"), "left_semi")
      .withColumn("nrm", sqrt(VectorExpressions.dense_dot(col("v"), col("v"))))
      .persist()
    val verified = cand
      .join(rel.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a")), "id_a")
      .join(rel.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b")), "id_b")
      .withColumn("cosine",
        round(when(col("n_a") === 0.0 || col("n_b") === 0.0, lit(0.0))
          .otherwise(VectorExpressions.dense_dot(col("v_a"), col("v_b")) /
            (col("n_a") * col("n_b"))), 6))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
    val out = Dedup.finishReleasing(verified, cand, rel)
    dSk.unpersist(blocking = false)
    dPo.unpersist(blocking = false)
    out
  }
}
