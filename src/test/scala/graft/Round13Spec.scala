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
    // full materialization: stored >=2-cluster members + implicit
    // singletons over the corpus ids (r14 partitioned snapshot)
    val got = assignSet(ClusterFold.currentClustersFull(spark, cl,
      all.select(col("doc_id").as("id"))))
    val batch = assignSet(Dedup.resolveClusters(
      Dedup.winnowPairs(all, k = 4, w = 4, minShared = 2)
        .select(col("id_a"), col("id_b")),
      all.select(col("doc_id").as("id"))))
    assert(got == batch)
    assert(got.groupBy(_._2).exists(_._2.size > 1)) // real multi-clusters
    // GC pin (ADVICE r12, r14 layout): one no-op publish aligns prev ==
    // current, after which every epoch dir on disk must be manifest-
    // referenced — a long stream leaks no superseded partitions
    ClusterFold.foldBatch(spark, cl, 999999L,
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"),
      Seq.empty[Long].toDF("id"))
    val refs = ClusterFold.readManifest(cl).get.dirsReferenced
    val onDisk = new java.io.File(cl).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("[ev]\\d+.*"))
      .map(_.getName).toSet
    assert(onDisk == refs, s"GC left unreferenced dirs: ${onDisk -- refs}")
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
    val got = assignSet(ClusterFold.currentClustersFull(spark, cl,
      all.select(col("vec_id").as("id"))))
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
    val after0 = assignSet(ClusterFold.storedClusters(spark, cl))
    // the pre-fix path read prev from v0 and overwrote v0 — Spark fails
    // with "Cannot overwrite a path that is also being read from" and the
    // stream can never recover; the fix skips the already-published epoch
    ClusterFold.foldBatch(spark, cl, 0L, p0, ids)
    assert(assignSet(ClusterFold.storedClusters(spark, cl)) == after0)
    assert(ClusterFold.currentVersion(cl).contains("v0"))
    // a LATER epoch still folds normally on top
    ClusterFold.foldBatch(spark, cl, 1L, Seq((1L, 2L)).toDF("id_a", "id_b"), ids)
    val after1 = assignSet(ClusterFold.currentClustersFull(spark, cl, ids))
    assert(after1 == assignSet(Dedup.resolveClusters(
      Seq((0L, 1L), (1L, 2L)).toDF("id_a", "id_b"), ids)))
  }

  test("ClusterFold: superseded partitions are GC'd, predecessor retained") {
    val cl = tmpPath("fold_gc")
    val ids = (0L to 5L).toDF("id")
    (0L to 3L).foreach { e =>
      ClusterFold.foldBatch(spark, cl, e, Seq((e, e + 1)).toDF("id_a", "id_b"), ids)
    }
    // every fold grows the SAME cluster, so each epoch rewrites all its
    // partitions: the manifest references only e3, the predecessor e2
    // survives one flip for in-flight readers, everything older is gone
    val names = new java.io.File(cl).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("[ev]\\d+.*"))
      .map(_.getName).toSet
    assert(names == Set("e2", "e3"), s"expected {e2,e3}, got $names")
    assert(ClusterFold.currentVersion(cl).contains("v3"))
    // absent pointer maps to None (FileNotFoundException path) — any other
    // IO failure propagates per the ADVICE fix
    assert(ClusterFold.currentVersion(tmpPath("fold_absent")).isEmpty)
  }

  test("ClusterFold: zero-pair epoch publishes by reference (zero data IO)") {
    val cl = tmpPath("fold_zeroio")
    val ids = (0L to 5L).toDF("id")
    ClusterFold.foldBatch(spark, cl, 0L, Seq((0L, 1L)).toDF("id_a", "id_b"), ids)
    val before = assignSet(ClusterFold.storedClusters(spark, cl))
    val dirsBefore = new java.io.File(cl).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    ClusterFold.foldBatch(spark, cl, 1L,
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), ids)
    // version bumped (replay protocol advances) but NO new epoch dir was
    // written — every partition carried over by manifest reference
    assert(ClusterFold.currentVersion(cl).contains("v1"))
    val dirsAfter = new java.io.File(cl).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirsAfter == dirsBefore, s"zero-pair epoch wrote: ${dirsAfter -- dirsBefore}")
    assert(assignSet(ClusterFold.storedClusters(spark, cl)) == before)
  }

  test("ClusterFold: untouched clusters publish by reference, not rewrite") {
    val cl = tmpPath("fold_touch")
    val ids = (0L to 8L).toDF("id")
    // two disjoint clusters in distinct pmod partitions (nPart = 8)
    ClusterFold.foldBatch(spark, cl, 0L,
      Seq((0L, 1L), (2L, 3L)).toDF("id_a", "id_b"), ids)
    // this pair touches ONLY the {0,1} component
    ClusterFold.foldBatch(spark, cl, 1L, Seq((0L, 4L)).toDF("id_a", "id_b"), ids)
    val m = ClusterFold.readManifest(cl).get
    assert(m.entries(("byid", 2)) == "e0",
      "untouched cluster's partition was rewritten instead of referenced")
    assert(m.entries(("byid", 0)) == "e1") // touched partition moved
    assert(m.entries(("byroot", 2)) == "e0")
    // correctness unaffected: full relation equals the whole-pair closure
    assert(assignSet(ClusterFold.currentClustersFull(spark, cl, ids)) ==
      assignSet(Dedup.resolveClusters(
        Seq((0L, 1L), (2L, 3L), (0L, 4L)).toDF("id_a", "id_b"), ids)))
    // the two mirrored relations hold identical rows
    val byid = assignSet(ClusterFold.storedClusters(spark, cl))
    val m2 = ClusterFold.readManifest(cl).get
    val rootParts = m2.entries.keysIterator.collect { case ("byroot", k) => k }.toSeq
    val byroot = spark.read.parquet(rootParts.flatMap(k =>
      m2.entries.get(("byroot", k)).map(e => s"$cl/$e/byroot/pb=$k")): _*)
      .collect().map(r => (r.getLong(r.fieldIndex("id")),
        r.getLong(r.fieldIndex("cluster_id")))).toSet
    assert(byid == byroot, "byid/byroot mirrors diverged")
  }

  test("ClusterFold: legacy flat snapshot migrates on its first fold") {
    val cl = tmpPath("fold_legacy")
    val ids = (0L to 6L).toDF("id")
    // pre-r14 layout: one flat dir with the FULL relation (singletons
    // included), CURRENT naming just the version
    Dedup.resolveClusters(Seq((0L, 1L), (3L, 4L)).toDF("id_a", "id_b"), ids)
      .write.mode("overwrite").parquet(s"$cl/v0")
    graft.dedup.IndexMeta.write(cl, "CURRENT", Seq("v0"))
    ClusterFold.foldBatch(spark, cl, 1L, Seq((1L, 2L)).toDF("id_a", "id_b"), ids)
    val m = ClusterFold.readManifest(cl).get
    assert(m.nPart > 0, "legacy snapshot did not migrate to the partitioned layout")
    assert(assignSet(ClusterFold.currentClustersFull(spark, cl, ids)) ==
      assignSet(Dedup.resolveClusters(
        Seq((0L, 1L), (3L, 4L), (1L, 2L)).toDF("id_a", "id_b"), ids)))
    // stored rows exclude singletons (implicit-absent contract)
    assert(assignSet(ClusterFold.storedClusters(spark, cl)) ==
      Set((0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 3L)))
    // one more fold retires the legacy dir (predecessor retention is one flip)
    ClusterFold.foldBatch(spark, cl, 2L,
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), ids)
    ClusterFold.foldBatch(spark, cl, 3L,
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), ids)
    assert(!new java.io.File(s"$cl/v0").exists(), "legacy flat dir leaked past GC")
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
