package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * The index is GROUP-KEYED: one row per DISTINCT vector (gid =
  * xxhash64(v) — the same group key and accepted ~2⁻⁶⁴ collision odds as
  * the batch form's duplicate-vector collapse), with the member-id list
  * as payload. Identical vectors have identical buckets AND identical
  * cosine against every third vector, so candidate generation and
  * verification run once per group and pairs expand row-locally at the
  * end. Without this, the replica regime is quadratic where the batch
  * form is linear (first-cut measurement: delta 310 MB shuffle at ×10
  * against the batch's 16 — every identical-vector cross product flowed
  * through the candidate join; group-keying removes it at WRITE time, so
  * postings stay one-row-per-distinct-vector at ANY duplication factor).
  *
  * Layout under `path`: `EMB_META` (dim/nbits/tables/seed), `postings/` —
  * (table, bucket, gid), `sketches/` — (gid, v, members). Appends add new
  * rows per gid; reads merge member lists for the (candidate-reduced) gid
  * slice only.
  *
  * Scale shape of [[deltaPairs]]: the delta's group buckets and the
  * candidate gid set broadcast; the index postings and sketches are each
  * scanned ONCE and never shuffled — the [[MinhashIndex.deltaPairs]]
  * contract, now on group-level relations. */
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

  /** Group-keyed (sketches, postings) of one corpus — the batch collapse
    * applied at index time. One groupBy shuffle (ingest cost, paid once);
    * the bucket UDF runs once per DISTINCT vector. */
  private def sketchAndBucket(df: DataFrame, vecCol: String, idCol: String,
      m: Meta): (DataFrame, DataFrame) = {
    val planes = Dedup.lshPlanes(m.tables, m.nbits, m.dim, m.seed)
    val sketches = df
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("gid", xxhash64(col("v")))
      .groupBy(col("gid"))
      .agg(first(col("v")).as("v"), sort_array(collect_list(col("id"))).as("members"))
    val postings = sketches
      .select(col("gid"),
        posexplode(Dedup.lshBucketCol(col("v"), planes)).as(Seq("table", "bucket")))
      .select(col("table"), col("bucket"), col("gid"))
    (sketches, postings)
  }

  def write(df: DataFrame, path: String, vecCol: String = "embedding",
      idCol: String = "vec_id", dim: Int = 64, nbits: Int = 8,
      tables: Int = 4, seed: Long = 42L): Unit = {
    val m = Meta(dim, nbits, tables, seed)
    val (sketches0, _) = sketchAndBucket(df, vecCol, idCol, m)
    val sketches = sketches0.persist()
    sketches.write.mode("overwrite").parquet(sketchesDir(path))
    val planes = Dedup.lshPlanes(m.tables, m.nbits, m.dim, m.seed)
    sketches
      .select(col("gid"),
        posexplode(Dedup.lshBucketCol(col("v"), planes)).as(Seq("table", "bucket")))
      .select(col("table"), col("bucket"), col("gid"))
      .write.mode("overwrite").parquet(postingsDir(path))
    sketches.unpersist(blocking = false)
    writeMeta(path, m)
  }

  /** Fold a (checked) batch in. A gid already present gains a SECOND
    * sketches row (member lists merge at read for candidate gids) and
    * duplicate postings rows (candidate dedup absorbs them). */
  def append(delta: DataFrame, path: String, vecCol: String = "embedding",
      idCol: String = "vec_id"): Unit = {
    val (sketches0, _) = sketchAndBucket(delta, vecCol, idCol, readMeta(path))
    val m = readMeta(path)
    val sketches = sketches0.persist()
    sketches.write.mode("append").parquet(sketchesDir(path))
    val planes = Dedup.lshPlanes(m.tables, m.nbits, m.dim, m.seed)
    sketches
      .select(col("gid"),
        posexplode(Dedup.lshBucketCol(col("v"), planes)).as(Seq("table", "bucket")))
      .select(col("table"), col("bucket"), col("gid"))
      .write.mode("append").parquet(postingsDir(path))
    sketches.unpersist(blocking = false)
  }

  /** Cosine near-dup pairs (id_a < id_b, cosine ≥ threshold) touching the
    * delta — never old×old, even INSIDE a duplicate group (expansion emits
    * old×new and new×new member pairs only). Output equals
    * `embeddingNearDupLsh(base ∪ delta)` restricted to pairs with a delta
    * side (spec-pinned, both batch branches); cosine math mirrors it
    * exactly (zero-norm sides score 0.0, round to 6 dp, threshold on the
    * rounded value). */
  def deltaPairs(spark: SparkSession, path: String, delta: DataFrame,
      vecCol: String = "embedding", idCol: String = "vec_id",
      threshold: Double = 0.95): DataFrame = {
    val m = readMeta(path)
    val postings = spark.read.parquet(postingsDir(path))
    val sketches = spark.read.parquet(sketchesDir(path))
    val (dSk0, _) = sketchAndBucket(delta, vecCol, idCol, m)
    val dSk = dSk0.persist()
    dSk.count() // one delta groupBy feeds buckets, vectors, and members
    val planes = Dedup.lshPlanes(m.tables, m.nbits, m.dim, m.seed)
    val dPost = dSk.select(col("gid"),
      posexplode(Dedup.lshBucketCol(col("v"), planes)).as(Seq("table", "bucket")))

    // candidate GROUP pairs: ≥1 shared bucket, ≥1 delta side — group-level
    // volume, immune to the duplication factor
    val crossGid = postings
      .join(broadcast(dPost.select(col("table"), col("bucket")).distinct()),
        Seq("table", "bucket"))
      .select(col("table"), col("bucket"), col("gid").as("g_old"))
      .join(broadcast(dPost.select(col("table"), col("bucket"), col("gid").as("g_new"))),
        Seq("table", "bucket"))
      .where(col("g_old") =!= col("g_new"))
      .select(least(col("g_old"), col("g_new")).as("g_a"),
        greatest(col("g_old"), col("g_new")).as("g_b"))
      .dropDuplicates("g_a", "g_b")
    val newNewGid = Dedup.bucketPairsPublic(
      dPost.select(col("table"), col("bucket"), col("gid").as("id")),
      Seq("table", "bucket"))
      .select(col("id_a").as("g_a"), col("id_b").as("g_b"))
    val candGid = crossGid.unionByName(newNewGid)
      .dropDuplicates("g_a", "g_b").persist()
    candGid.count()

    // ONE sketches scan, semi-reduced to the gids that matter (candidates
    // + every delta gid, whose index members feed within-group pairs);
    // member lists merge across append batches here, for this slice only
    val gidSet = candGid.select(col("g_a").as("gid"))
      .unionByName(candGid.select(col("g_b").as("gid")))
      .unionByName(dSk.select(col("gid"))).distinct()
    // consumed exactly once (the groups join below) — no persist
    val oldRel = sketches
      .join(broadcast(gidSet), Seq("gid"), "left_semi")
      .groupBy(col("gid"))
      .agg(first(col("v")).as("v"),
        sort_array(flatten(collect_list(col("members")))).as("old_members"))
    // per-gid (v, old members, new members) — either side may be absent
    val groups = oldRel
      .join(dSk.select(col("gid"), col("v").as("v_new"),
        col("members").as("new_members")), Seq("gid"), "full_outer")
      .select(col("gid"), coalesce(col("v"), col("v_new")).as("v"),
        coalesce(col("old_members"), array().cast("array<long>")).as("om"),
        coalesce(col("new_members"), array().cast("array<long>")).as("nm"))
      .withColumn("nrm", sqrt(VectorExpressions.dense_dot(col("v"), col("v"))))
      .persist()
    groups.count() // materialize before the within/cross fan-out below

    def cosine(va: Column, na: Column, vb: Column, nb: Column): Column =
      round(when(na === 0.0 || nb === 0.0, lit(0.0))
        .otherwise(VectorExpressions.dense_dot(va, vb) / (na * nb)), 6)

    // within-group: self-cosine gates (zero-norm groups drop, matching the
    // batch form); old×old member pairs are NEVER emitted
    val within = groups
      .where(size(col("nm")) > 0 &&
        (size(col("om")) > 0 || size(col("nm")) > 1))
      .withColumn("cosine", cosine(col("v"), col("nrm"), col("v"), col("nrm")))
      .where(col("cosine") >= threshold)
      .select(explode(concat(
          Dedup.crossPairsUdf(col("om"), col("nm")),
          Dedup.withinPairsUdf(col("nm")))).as("p"),
        col("cosine"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"), col("cosine"))
    // cross-group: verify once per gid pair, expand delta-touching member
    // pairs only (newA×allB ∪ oldA×newB)
    val cross = candGid
      .join(groups.select(col("gid").as("g_a"), col("v").as("v_a"),
        col("nrm").as("n_a"), col("om").as("om_a"), col("nm").as("nm_a")), "g_a")
      .join(groups.select(col("gid").as("g_b"), col("v").as("v_b"),
        col("nrm").as("n_b"), col("om").as("om_b"), col("nm").as("nm_b")), "g_b")
      .withColumn("cosine", cosine(col("v_a"), col("n_a"), col("v_b"), col("n_b")))
      .where(col("cosine") >= threshold)
      .select(explode(concat(
          Dedup.crossPairsUdf(col("nm_a"), concat(col("om_b"), col("nm_b"))),
          Dedup.crossPairsUdf(col("om_a"), col("nm_b")))).as("p"),
        col("cosine"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"), col("cosine"))
    val out = Dedup.finishReleasing(within.unionByName(cross), candGid, groups)
    dSk.unpersist(blocking = false)
    out
  }
}
