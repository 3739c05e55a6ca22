package graft

import org.apache.spark.sql.functions._

import graft.dedup.{ClusterFold, Dedup, EmbeddingIndex, IndexMeta,
  MinhashIndex, WinnowIndex}

/** Round-16 pins (VERDICT r15 tasks #1, #3, #4 + ADVICE r15 #2):
  *
  *  - the over-cutoff fold path never materializes batch ids on the
  *    driver: a backfill-shaped single batch (pairs ≫ cutoff) folds via
  *    the relational prior-lookup and still equals whole-corpus
  *    `resolveClusters`, including against pre-existing snapshot state;
  *  - GC telemetry is keyed per snapshot dir (two interleaved folds into
  *    different dirs cannot clobber each other's op count);
  *  - the live-stream lock: `sweep`/`compact` throw while a streaming
  *    session holds the dir's lock, the loops release it on termination,
  *    a stale lock is taken over by the next stream but blocks the
  *    offline tools until `forceUnlock`;
  *  - a seeded randomized crash/redelivery/compaction property over the
  *    three written-index DELTA legs (the r15 review bugs — self-pairs on
  *    redelivery, null-vector NPE — all lived here and were found by
  *    review, not by oracle): random batches with duplicate redelivery,
  *    null/mis-dimensioned vectors, crash-debris injection and
  *    interleaved compaction must still accumulate exactly the
  *    whole-corpus pair relation.
  */
class Round16Spec extends SparkSpec {
  import spark.implicits._

  private def tmpPath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"r16_$tag").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  private def assignSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def pairsDF(ps: Seq[(Long, Long)]) = ps.toDF("id_a", "id_b")

  test("backfill fold: a single batch far past the driver cutoff folds relationally and matches resolveClusters") {
    val cl = tmpPath("backfill")
    val nIds = 3000L
    val universe = (0L until nIds).toDF("id")
    // seed epoch UNDER the cutoff: 100 disjoint 3-clusters — the backfill
    // then has real prior snapshot state to look up (found-roots path)
    val seed = (0L until 100L).flatMap(c =>
      Seq((3 * c, 3 * c + 1), (3 * c, 3 * c + 2)))
    ClusterFold.foldBatch(spark, cl, 0L, pairsDF(seed), universe,
      targetRows = 64L)
    // backfill batch: ~1450 pairs at cutoff 16 — includes pairs touching
    // seeded clusters (root lookups), fresh chains (absent-endpoint
    // roots), and a megacluster chain (the shape that made the old
    // driver-collect dangerous)
    val fresh = (600L until 2000L by 2).map(i => (i, i + 1))
    val chain = (2000L until 2050L).sliding(2).map { s => (s(0), s(1)) }.toSeq
    val touchSeed = (0L until 60L).map(c => (3 * c, 2100L + c))
    val backfill = fresh ++ chain ++ touchSeed
    ClusterFold.foldBatch(spark, cl, 1L, pairsDF(backfill), universe,
      targetRows = 64L, maxDriverRows = 16)
    assert(assignSet(ClusterFold.currentClustersFull(spark, cl, universe)) ==
      assignSet(Dedup.resolveClusters(pairsDF(seed ++ backfill), universe)))
    // and a second over-cutoff epoch against the now-large snapshot
    val again = (700L until 1500L by 2).map(i => (i, i + 501))
    ClusterFold.foldBatch(spark, cl, 2L, pairsDF(again), universe,
      targetRows = 64L, maxDriverRows = 16)
    assert(assignSet(ClusterFold.currentClustersFull(spark, cl, universe)) ==
      assignSet(Dedup.resolveClusters(pairsDF(seed ++ backfill ++ again), universe)))
  }

  test("legacy flat snapshot + over-cutoff batch: migration rides the relational path") {
    // the two rare regimes COMBINED: a pre-r14 flat snapshot (forced full
    // migration, prevTouched = whole prior relation) hit by a batch past
    // the driver cutoff (pairsLocal = false, distributed CC + relational
    // root handling) — neither prior pin crossed them together
    val cl = tmpPath("legover")
    val ids = (0L until 64L).toDF("id")
    val oldPairs = (0L until 20L).map(c => (2 * c, 2 * c + 1))
    Dedup.resolveClusters(pairsDF(oldPairs), ids)
      .write.mode("overwrite").parquet(s"$cl/v0")
    IndexMeta.write(cl, "CURRENT", Seq("v0"))
    val newPairs = (0L until 30L).map(i => (i, i + 30L))
    ClusterFold.foldBatch(spark, cl, 1L, pairsDF(newPairs), ids,
      maxDriverRows = 0)
    val m = ClusterFold.readManifest(cl).get
    assert(m.nPart > 0, "legacy snapshot did not migrate")
    assert(assignSet(ClusterFold.currentClustersFull(spark, cl, ids)) ==
      assignSet(Dedup.resolveClusters(pairsDF(oldPairs ++ newPairs), ids)))
    // and another over-cutoff fold against the now-partitioned snapshot
    ClusterFold.foldBatch(spark, cl, 2L, pairsDF(Seq((0L, 62L))), ids,
      maxDriverRows = 0)
    assert(assignSet(ClusterFold.currentClustersFull(spark, cl, ids)) ==
      assignSet(Dedup.resolveClusters(
        pairsDF(oldPairs ++ newPairs :+ ((0L, 62L))), ids)))
  }

  test("gc telemetry is keyed per snapshot dir") {
    val clA = tmpPath("gckeyA"); val clB = tmpPath("gckeyB")
    val ids = (0L until 40L).toDF("id")
    val seed = (0L until 19L).map(c => (2 * c, 2 * c + 1))
    for (cl <- Seq(clA, clB)) {
      ClusterFold.foldBatch(spark, cl, 0L, pairsDF(seed), ids, targetRows = 1L)
      ClusterFold.foldBatch(spark, cl, 1L, pairsDF(Seq((0L, 1L))), ids, targetRows = 1L)
    }
    // epoch 2 into A only: A's counter moves, B's stays at its own last
    ClusterFold.foldBatch(spark, clA, 2L, pairsDF(Seq((4L, 5L))), ids, targetRows = 1L)
    val a = ClusterFold.lastGcOps(clA)
    val b = ClusterFold.lastGcOps(clB)
    assert(a > 0L, "A's epoch-2 publish should have GC'd epoch-1 leaves")
    assert(ClusterFold.lastGcOps(tmpPath("gckeyNone")) == 0L)
    // B's record is from its own epoch-1 publish (no GC work yet at that
    // point — nothing superseded twice), not A's epoch-2 ops
    assert(b == 0L, s"B's telemetry was clobbered by A's fold: $b")
  }

  test("lock: sweep and compact throw while a stream session holds the dir, forceUnlock clears a stale lock") {
    val docs = (0 until 12).map { i =>
      (i.toLong, s"lock pin corpus item number ${i / 3} padded with common filler words")
    }.toDF("doc_id", "text")
    val idx = tmpPath("lockidx"); val cl = tmpPath("lockcl")
    MinhashIndex.write(docs, idx)
    ClusterFold.foldBatch(spark, cl, 0L, pairsDF(Seq((0L, 1L))),
      (0L until 12L).toDF("id"))
    // simulate the open stream session (the loops take exactly this lock)
    IndexMeta.lock(idx, s"$idx/_checkpoint"); IndexMeta.lock(cl, s"$idx/_checkpoint")
    val e1 = intercept[IllegalStateException] { MinhashIndex.sweepClusters(cl) }
    assert(e1.getMessage.contains("sweep"))
    val e2 = intercept[IllegalStateException] { MinhashIndex.compact(spark, idx) }
    assert(e2.getMessage.contains("compact"))
    // crashed session: the stale lock blocks offline tools until cleared
    MinhashIndex.forceUnlock(idx); MinhashIndex.forceUnlock(cl)
    MinhashIndex.sweepClusters(cl)
    MinhashIndex.compact(spark, idx)
    // winnow/embedding compact share the guard
    val widx = tmpPath("lockw")
    WinnowIndex.write(docs, widx, k = 4, w = 4)
    IndexMeta.lock(widx, s"$widx/_checkpoint")
    intercept[IllegalStateException] { WinnowIndex.compact(spark, widx) }
    WinnowIndex.forceUnlock(widx)
    val eidx = tmpPath("locke")
    EmbeddingIndex.write(
      (0L until 4L).map(i => (i, Seq.fill(8)(0.5f))).toDF("vec_id", "embedding"),
      eidx, dim = 8, nbits = 4, tables = 2)
    IndexMeta.lock(eidx, s"$eidx/_checkpoint")
    intercept[IllegalStateException] { EmbeddingIndex.compact(spark, eidx) }
    EmbeddingIndex.forceUnlock(eidx)
  }

  test("lock: the ingest loop takes over a stale lock, holds it during the stream, and releases on termination") {
    val all = (0 until 12).map { i =>
      (i.toLong, s"stale lock corpus item number ${i / 3} padded with common filler words")
    }.toDF("doc_id", "text")
    val srcDir = tmpPath("stale_src")
    all.repartition(2).write.mode("overwrite").parquet(srcDir)
    val root = tmpPath("stale")
    val idx = s"$root/index"; val cl = s"$root/clusters"
    MinhashIndex.write(all.limit(0), idx)
    // a crashed previous incarnation left both locks (SAME checkpoint
    // identity): checkpointed recovery must proceed without manual
    // intervention — the r17 create-exclusive lock retakes its own token
    IndexMeta.lock(idx, s"$idx/_checkpoint"); IndexMeta.lock(cl, s"$idx/_checkpoint")
    val st = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    MinhashIndex.ingestStreamClustered(st, idx, cl, threshold = 0.5)
    assert(!IndexMeta.locked(idx) && !IndexMeta.locked(cl),
      "clean termination must release the locks")
    // offline tools usable immediately after
    MinhashIndex.sweepClusters(cl)
    MinhashIndex.compact(spark, idx)
    assert(assignSet(ClusterFold.currentClustersFull(spark, cl,
      all.select(col("doc_id").as("id")))) ==
      assignSet(Dedup.resolveClusters(
        Dedup.minhashLsh(all, threshold = 0.5).select(col("id_a"), col("id_b")),
        all.select(col("doc_id").as("id")))))
  }

  test("IndexMaintenance compaction mutex: a concurrent compaction fails loudly instead of racing base_v{N+1}") {
    import graft.streaming.IndexMaintenance
    val corpus = (0 until 40).map { i =>
      (i.toLong, Map(s"t${i % 7}" -> (1.0f + (i % 5) * 0.3f), "common" -> 0.8f))
    }.toDF("doc_id", "tokens")
    val root = tmpPath("imlock")
    IndexMaintenance.initialize(corpus.limit(30), root)
    IndexMaintenance.appendBatch(corpus.where(col("doc_id") >= 30), root)
    // a live maintain() loop (or a crashed run) holds the compact mutex:
    // a second compaction must throw, not overwrite base_v{N+1} mid-write
    assert(new java.io.File(root, "_COMPACT_LOCK").createNewFile())
    val e = intercept[IllegalStateException] { IndexMaintenance.compact(spark, root) }
    assert(e.getMessage.contains("_COMPACT_LOCK"))
    IndexMaintenance.forceUnlockCompact(root)
    val v1 = IndexMaintenance.compact(spark, root)
    assert(v1 == IndexMaintenance.currentVersion(root))
    // the mutex releases after a successful compaction (next cycle runs)
    IndexMaintenance.appendBatch(
      corpus.withColumn("doc_id", col("doc_id") + 100), root)
    assert(IndexMaintenance.compact(spark, root) == v1 + 1)
  }

  test("index-delta property: random batches with redelivery, debris, bad vectors, and compaction accumulate the exact whole-corpus pairs (all legs)") {
    val rnd = new scala.util.Random(20260818L)

    /** Rename a random live partition leaf to its crashed-mid-swap form —
      * the debris [[IndexCompaction.repairDir]] must restore before the
      * next pruned read (a real r14/r15 loss mode). */
    def injectDebris(dir: String): Boolean = {
      val d = new java.io.File(dir)
      val leaves = Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.contains("=")
          && !f.getName.startsWith("."))
      if (leaves.isEmpty) false
      else {
        val f = leaves(rnd.nextInt(leaves.length))
        f.renameTo(new java.io.File(d, s".retired_${f.getName}"))
      }
    }

    for (c <- 0 until 2; leg <- Seq("minhash", "winnow", "embedding")) {
      val nDocs = 24 + 3 * rnd.nextInt(4)
      // near-dup text corpus: clusters of 3 with a variant member
      val docs = (0 until nDocs).map { i =>
        (i.toLong, s"the shared boilerplate block number ${i / 3} continues " +
          s"with many common words ${if (i % 3 == 2) "ending differently" else "ending alike"}")
      }
      // embedding corpus: clusters of 2 + a null + a mis-dimensioned row
      // (the r15 NPE/truncation bugs were exactly these rows)
      val vecRows: Seq[(Long, Option[Seq[Float]])] =
        (0 until nDocs).map { i =>
          val v = Array.fill(16)(0f); v(i / 2 % 16) = 1f
          v(((i / 2) + 5) % 16) = 0.01f * (i / 2)
          (i.toLong, Some(v.toSeq))
        } ++ Seq((900L, None), (901L, Some(Seq.fill(5)(1.0f))))
      val root = tmpPath(s"prop_${c}_$leg")
      val idx = s"$root/index"

      // whole-corpus exact relation (the oracle)
      val (corpus, want) = leg match {
        case "minhash" =>
          val d = docs.toDF("doc_id", "text")
          MinhashIndex.write(d.limit(0), idx)
          (d, pairSet(Dedup.minhashLsh(d, threshold = 0.5)))
        case "winnow" =>
          val d = docs.toDF("doc_id", "text")
          WinnowIndex.write(d.limit(0), idx, k = 4, w = 4)
          (d, pairSet(Dedup.winnowPairs(d, k = 4, w = 4, minShared = 2)))
        case "embedding" =>
          val d = vecRows.toDF("vec_id", "embedding")
          EmbeddingIndex.write(d.limit(0), idx, dim = 16, nbits = 4, tables = 8)
          (d, pairSet(Dedup.embeddingNearDupLsh(d, dim = 16, threshold = 0.9,
            nbits = 4, tables = 8)))
      }
      val idCol = if (leg == "embedding") "vec_id" else "doc_id"
      val nBatches = 3 + rnd.nextInt(3)
      val salt = rnd.nextInt(1 << 20)
      val emitted = scala.collection.mutable.Set.empty[(Long, Long)]

      // the loop composition (repair → deltaPairs → append), driven batch
      // by batch with adversarial events between them
      def runBatch(b: org.apache.spark.sql.DataFrame): Unit = leg match {
        case "minhash" =>
          MinhashIndex.repair(idx)
          emitted ++= pairSet(MinhashIndex.deltaPairs(spark, idx, b, threshold = 0.5))
          MinhashIndex.append(b, idx)
        case "winnow" =>
          WinnowIndex.repair(idx)
          emitted ++= pairSet(WinnowIndex.deltaPairs(spark, idx, b, minShared = 2))
          WinnowIndex.append(b, idx)
        case "embedding" =>
          EmbeddingIndex.repair(idx)
          emitted ++= pairSet(EmbeddingIndex.deltaPairs(spark, idx, b, threshold = 0.9))
          EmbeddingIndex.append(b, idx)
      }

      val batches = (0 until nBatches).map { j =>
        corpus.where(pmod(xxhash64(col(idCol), lit(salt)), lit(nBatches)) === j)
      }
      batches.zipWithIndex.foreach { case (b, j) =>
        runBatch(b)
        // at-least-once redelivery: the SAME batch arrives again (index
        // already contains it) — must emit no self-pairs, no new pairs
        if (rnd.nextInt(3) == 0) {
          val before = emitted.toSet
          runBatch(b)
          assert(emitted.toSet == before,
            s"$leg case $c batch $j: redelivery changed the pair set " +
              s"(${emitted.toSet -- before})")
        }
        // crash-debris injection: a compact dies mid-swap on a random leaf
        if (rnd.nextInt(3) == 0) { injectDebris(s"$idx/postings"); () }
        // interleaved offline compaction (no live stream — lock-free here)
        if (j % 2 == 1) leg match {
          case "minhash" => MinhashIndex.compact(spark, idx, maxFiles = 1)
          case "winnow" => WinnowIndex.compact(spark, idx, maxFiles = 1)
          case "embedding" => EmbeddingIndex.compact(spark, idx, maxFiles = 1)
        }
      }
      assert(emitted.forall(p => p._1 < p._2),
        s"$leg case $c emitted self/inverted pairs: ${emitted.filter(p => p._1 >= p._2)}")
      assert(emitted.toSet == want,
        s"$leg case $c ($nBatches batches, salt $salt): streamed " +
          s"${emitted.size} pairs vs whole-corpus ${want.size} " +
          s"(missing ${want -- emitted}, extra ${emitted.toSet -- want})")
    }
  }
}
