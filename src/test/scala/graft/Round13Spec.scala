package graft

import org.apache.spark.sql.functions._

import graft.dedup.{ClusterFold, Dedup, EmbeddingIndex, WinnowIndex}

/** Round-13 pins: the leg-agnostic cluster fold ([[graft.dedup
  * .ClusterFold]]) behind every `ingestStreamClustered`, its at-least-once
  * hardening (ADVICE r12), and the winnow/embedding streaming
  * dedup-to-clusters legs (VERDICT r12 task #6). */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  private def tmpPath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"r13_$tag").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  private def docs(n: Int) = (0 until n).map { i =>
    val cluster = i / 3
    (i.toLong, s"the quick brown fox number $cluster jumps over the lazy dog " +
      s"and then walks around the block ${if (i % 3 == 2) "slowly today" else "quickly"}")
  }.toDF("doc_id", "text")

  private def vecs(n: Int, dim: Int = 16) = (0 until n).map { i =>
    val v = Array.fill(dim)(0f)
    if (i < n - 1) { v(i % 4) = 1f; v((i % 4) + 4) = 0.02f * (i / 4) }
    (i.toLong, v.toSeq)
  }.toDF("vec_id", "embedding")

  private def assignSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("WinnowIndex.ingestStreamClustered: live assignment == whole-corpus closure") {
    val all = docs(30).persist()
    val srcDir = tmpPath("clw_src")
    all.repartition(3).write.mode("overwrite").parquet(srcDir)
    val root = tmpPath("clw_stream")
    val idx = s"$root/index"; val cl = s"$root/clusters"
    WinnowIndex.write(all.limit(0), idx, k = 4, w = 4)
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    WinnowIndex.ingestStreamClustered(stream, idx, cl, minShared = 2)
    val got = assignSet(WinnowIndex.currentClusters(spark, cl))
    val batch = assignSet(Dedup.resolveClusters(
      Dedup.winnowPairs(all, k = 4, w = 4, minShared = 2)
        .select(col("id_a"), col("id_b")),
      all.select(col("doc_id").as("id"))))
    assert(got == batch)
    assert(got.groupBy(_._2).exists(_._2.size > 1)) // real multi-clusters
    // GC pin (ADVICE r12): >= 3 epochs published, <= 2 snapshots survive
    val versions = new java.io.File(cl).listFiles()
      .count(f => f.isDirectory && f.getName.matches("v\\d+"))
    assert(versions <= 2, s"version GC left $versions snapshots")
    all.unpersist()
  }

  test("EmbeddingIndex.ingestStreamClustered: live assignment == whole-corpus closure") {
    // verbatim duplicates included: cross-batch member merging through the
    // group-keyed sketches must feed the closure, not just singleton gids
    val all = vecs(18).unionByName(
      vecs(18).withColumn("vec_id", col("vec_id") + 100)).persist()
    val srcDir = tmpPath("cle_src")
    all.repartition(3).write.mode("overwrite").parquet(srcDir)
    val root = tmpPath("cle_stream")
    val idx = s"$root/index"; val cl = s"$root/clusters"
    EmbeddingIndex.write(all.limit(0), idx, dim = 16, nbits = 4, tables = 8)
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    EmbeddingIndex.ingestStreamClustered(stream, idx, cl, threshold = 0.9)
    val got = assignSet(EmbeddingIndex.currentClusters(spark, cl))
    val batch = assignSet(Dedup.resolveClusters(
      Dedup.embeddingNearDupLsh(all, dim = 16, threshold = 0.9,
        nbits = 4, tables = 8).select(col("id_a"), col("id_b")),
      all.select(col("vec_id").as("id"))))
    assert(got == batch)
    assert(got.groupBy(_._2).exists(_._2.size > 1))
    all.unpersist()
  }

  test("ClusterFold.foldBatch: replayed epoch is a safe no-op (no self-overwrite)") {
    val cl = tmpPath("fold_replay")
    val ids = (0L to 5L).toDF("id")
    val p0 = Seq((0L, 1L)).toDF("id_a", "id_b")
    ClusterFold.foldBatch(spark, cl, 0L, p0, ids)
    val after0 = assignSet(ClusterFold.currentClusters(spark, cl))
    // the pre-fix path read prev from v0 and overwrote v0 — Spark fails
    // with "Cannot overwrite a path that is also being read from" and the
    // stream can never recover; the fix skips the already-published epoch
    ClusterFold.foldBatch(spark, cl, 0L, p0, ids)
    assert(assignSet(ClusterFold.currentClusters(spark, cl)) == after0)
    assert(ClusterFold.currentVersion(cl).contains("v0"))
    // a LATER epoch still folds normally on top
    ClusterFold.foldBatch(spark, cl, 1L, Seq((1L, 2L)).toDF("id_a", "id_b"), ids)
    val after1 = assignSet(ClusterFold.currentClusters(spark, cl))
    assert(after1 == assignSet(Dedup.resolveClusters(
      Seq((0L, 1L), (1L, 2L)).toDF("id_a", "id_b"), ids)))
  }

  test("ClusterFold: superseded snapshots are GC'd, predecessor retained") {
    val cl = tmpPath("fold_gc")
    val ids = (0L to 5L).toDF("id")
    (0L to 3L).foreach { e =>
      ClusterFold.foldBatch(spark, cl, e, Seq((e, e + 1)).toDF("id_a", "id_b"), ids)
    }
    val names = new java.io.File(cl).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName).toSet
    assert(names == Set("v2", "v3"), s"expected {v2,v3}, got $names")
    assert(ClusterFold.currentVersion(cl).contains("v3"))
    // absent pointer maps to None (FileNotFoundException path) — any other
    // IO failure propagates per the ADVICE fix
    assert(ClusterFold.currentVersion(tmpPath("fold_absent")).isEmpty)
  }

  test("EmbeddingIndex capped delta: equal-count disjoint appends both count (bid fix)") {
    // ONE distinct vector shared by every doc: all ids share one gid, so
    // the id-level bucket population is the total member count. Base has
    // 3 members; two LEGITIMATE disjoint appends add 2 members each with
    // EQUAL counts — the r12 nm-row heuristic collapsed them (pop 6 with
    // the delta), the bid fix keeps them distinct (pop 8)
    def sameVec(ids: Seq[Long]) =
      ids.map(i => (i, Seq.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val path = tmpPath("em_bid")
    EmbeddingIndex.write(sameVec(Seq(0L, 1L, 2L)), path,
      dim = 8, nbits = 4, tables = 2)
    EmbeddingIndex.append(sameVec(Seq(100L, 101L)), path)
    EmbeddingIndex.append(sameVec(Seq(200L, 201L)), path)
    val delta = sameVec(Seq(300L))
    // true combined population = 3 + 2 + 2 + 1 = 8 > 7 → every bucket of
    // the group is hot → NO pairs (the id-level capped-batch semantics);
    // the nm heuristic undercounted to 6 <= 7 and wrongly emitted pairs
    val capped = EmbeddingIndex.deltaPairs(spark, path, delta,
      threshold = 0.9, maxBucket = Some(7))
    assert(capped.isEmpty, "undercounted population let a hot bucket emit pairs")
    // cap just above the true population → the group survives and the
    // delta pairs against every indexed member
    val loose = EmbeddingIndex.deltaPairs(spark, path, delta,
      threshold = 0.9, maxBucket = Some(8))
    assert(loose.count() == 7L) // 300 × {0,1,2,100,101,200,201}
  }
}
