package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.seismic.Seismic
import graft.seismic.Seismic.SeismicIndex
import graft.sparse.SparseRetrieval

/** Incremental SEISMIC index maintenance — the streaming analogue of the
  * reference's segment lifecycle (sparse/codec/SparsePostingsConsumer.java
  * builds the clustered index at segment FLUSH; codec/MergeHelper.java:1-198
  * re-clusters merged segments). The Lucene shape maps onto Spark as:
  *
  *   - segment flush  → each micro-batch APPENDS its rows to a delta
  *     directory (one parquet append per trigger);
  *   - fresh-segment search → queries run pruned SEISMIC over the immutable
  *     BASE plus an EXACT scan over the (small) delta, merged top-k — the
  *     same physical policy as the reference's approximate_threshold gate,
  *     which searches sub-threshold segments exactly
  *     (SparseRetrieval.strategicTopK);
  *   - segment merge  → when the delta outgrows `maxDeltaRatio` × base, a
  *     COMPACTION rebuilds the clustered index over base ∪ delta and
  *     publishes it as a new immutable version (old versions stay readable
  *     until the pointer moves — crash-safe, like Lucene's segments_N).
  *
  * Layout under `rootDir`:
  *   base_v{N}/        corpus parquet of version N
  *   index_v{N}/       SEISMIC tables of version N (Seismic.write)
  *   delta/batch_{B}/  one dir per appended micro-batch (id B)
  *   VERSION           "version watermark" (atomic pointer, written last)
  *
  * Crash-safety contract: publish is ONE atomic rename of VERSION, which
  * carries BOTH the new version and the delta WATERMARK (the highest batch
  * id folded into that version). `readDelta` serves only batches above the
  * watermark, so a crash between publish and the physical delta cleanup
  * can never double-serve rows (the stale dirs are invisible and the next
  * compaction deletes them). Batch appends write whole per-batch dirs with
  * overwrite semantics, so a replayed micro-batch (foreachBatch is
  * at-least-once) lands on the same dir instead of duplicating rows. */
object IndexMaintenance {

  /** Pointer to the live version — written LAST during publish so a reader
    * never sees a half-written version (rename-based single-file commit). */
  def currentVersion(rootDir: String): Long = versionAndWatermark(rootDir)._1

  /** (version, delta watermark): batches with id ≤ watermark are already
    * folded into base_v{version}. A bare-number VERSION (pre-watermark
    * layout) reads as watermark −1. */
  private[streaming] def versionAndWatermark(rootDir: String): (Long, Long) = {
    val f = new java.io.File(rootDir, "VERSION")
    if (!f.exists()) (0L, -1L)
    else {
      val parts = new String(java.nio.file.Files.readAllBytes(f.toPath)).trim.split("\\s+")
      (parts(0).toLong, if (parts.length > 1) parts(1).toLong else -1L)
    }
  }

  private def writeVersion(rootDir: String, v: Long, watermark: Long): Unit = {
    val tmp = new java.io.File(rootDir, s".VERSION.tmp$v")
    java.nio.file.Files.write(tmp.toPath, s"$v $watermark".getBytes)
    java.nio.file.Files.move(tmp.toPath, new java.io.File(rootDir, "VERSION").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def baseDir(rootDir: String, v: Long): String = s"$rootDir/base_v$v"
  def indexDir(rootDir: String, v: Long): String = s"$rootDir/index_v$v"
  def deltaDir(rootDir: String): String = s"$rootDir/delta"

  private val BatchDirRe = "batch_(\\d+)".r
  private def listBatchIds(rootDir: String): Seq[Long] = {
    val d = new java.io.File(deltaDir(rootDir))
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq.flatMap(_.getName match {
      case BatchDirRe(id) => Some(id.toLong)
      case _ => None
    })
  }

  /** Initialize version 0 from a bootstrap corpus (the first full build —
    * the reference's initial index creation). */
  def initialize(corpus: DataFrame, rootDir: String,
      nPostings: Int = Seismic.DefaultNPostings): Unit = {
    new java.io.File(rootDir).mkdirs()
    corpus.write.mode("overwrite").parquet(baseDir(rootDir, 0))
    val base = corpus.sparkSession.read.parquet(baseDir(rootDir, 0))
    Seismic.write(Seismic.build(base, nPostings = nPostings), indexDir(rootDir, 0))
    writeVersion(rootDir, 0, -1)
  }

  /** Append one micro-batch of docs to the delta (the flush analogue).
    * The batch lands in its OWN dir keyed by `batchId` with overwrite
    * semantics — an at-least-once replay of the same micro-batch
    * overwrites its previous attempt instead of appending duplicates.
    * Without an explicit id (ad-hoc appends), the next free id above both
    * the existing dirs and the compaction watermark is assigned. */
  def appendBatch(batch: DataFrame, rootDir: String, batchId: Long = -1L): Unit = {
    val id =
      if (batchId >= 0) batchId
      else (listBatchIds(rootDir) :+ versionAndWatermark(rootDir)._2).max + 1
    batch.write.mode("overwrite").parquet(s"${deltaDir(rootDir)}/batch_$id")
  }

  /** The delta corpus: batches ABOVE the watermark only (compacted dirs
    * are invisible even before their physical cleanup) — empty-schema-safe
    * when no batch has arrived yet. */
  def readDelta(spark: SparkSession, rootDir: String, like: DataFrame): DataFrame = {
    val wm = versionAndWatermark(rootDir)._2
    val live = listBatchIds(rootDir).filter(_ > wm).sorted
      .map(id => s"${deltaDir(rootDir)}/batch_$id")
    if (live.isEmpty) like.limit(0)
    else spark.read.schema(like.schema).parquet(live: _*)
  }

  /** Merge policy: compact when the delta reaches `maxDeltaRatio` of the
    * base (the exact-scanned fraction of every query stays bounded). */
  def shouldCompact(baseRows: Long, deltaRows: Long, maxDeltaRatio: Double): Boolean =
    deltaRows > 0 && deltaRows >= math.max(1.0, baseRows * maxDeltaRatio)

  /** Compaction mutex: two concurrent compactions (an offline run racing
    * a live [[maintain]] loop's ratio-triggered one) would both read
    * VERSION v and both write `base_v{v+1}` — overlapping overwrites of
    * one directory mid-write. The guard is a create-exclusive marker held
    * for the compaction's duration (createNewFile is atomic on the local
    * FS this module's meta already assumes); the loser fails loudly. A
    * crashed compaction leaves a stale marker that blocks only further
    * compactions — clear it with [[forceUnlockCompact]]. Reads need no
    * guard: the version pointer is atomic and v{N} dirs are never touched.
    */
  private def withCompactLock[T](rootDir: String)(body: => T): T = {
    val lock = new java.io.File(rootDir, "_COMPACT_LOCK")
    if (!lock.createNewFile())
      throw new IllegalStateException(
        s"compact($rootDir) refused: another compaction holds _COMPACT_LOCK" +
          " (a live maintain() loop, or a crashed run's stale marker —" +
          " clear with forceUnlockCompact)")
    try body finally { lock.delete(); () }
  }

  /** Clear a crashed compaction's stale `_COMPACT_LOCK`. */
  def forceUnlockCompact(rootDir: String): Unit = {
    new java.io.File(rootDir, "_COMPACT_LOCK").delete(); ()
  }

  /** Re-cluster base ∪ delta into version N+1 and move the pointer;
    * compacted delta batches retire via the WATERMARK inside the same
    * atomic VERSION rename (a crash after publish but before the physical
    * cleanup leaves invisible dirs, never duplicate rows). Readers holding
    * version N keep working — nothing under v{N} is touched. */
  def compact(spark: SparkSession, rootDir: String,
      nPostings: Int = Seismic.DefaultNPostings): Long = withCompactLock(rootDir) {
    val (v, wm) = versionAndWatermark(rootDir)
    // snapshot the batch set BEFORE reading: batches landing mid-compaction
    // stay above the published watermark and survive into the next cycle
    val ids = listBatchIds(rootDir).filter(_ > wm).sorted
    val base = spark.read.parquet(baseDir(rootDir, v))
    val delta =
      if (ids.isEmpty) base.limit(0)
      else spark.read.schema(base.schema)
        .parquet(ids.map(id => s"${deltaDir(rootDir)}/batch_$id"): _*)
    base.unionByName(delta).write.mode("overwrite").parquet(baseDir(rootDir, v + 1))
    val merged = spark.read.parquet(baseDir(rootDir, v + 1))
    Seismic.write(Seismic.build(merged, nPostings = nPostings), indexDir(rootDir, v + 1))
    val newWm = if (ids.isEmpty) wm else ids.max
    writeVersion(rootDir, v + 1, newWm) // ONE atomic publish: version + retirement
    cleanupRetired(rootDir, newWm)      // best-effort; watermark already hides them
    v + 1
  }

  /** Physical removal of batch dirs at or below the watermark — pure
    * hygiene, idempotent, safe to crash out of at any point. */
  private def cleanupRetired(rootDir: String, watermark: Long): Unit =
    listBatchIds(rootDir).filter(_ <= watermark).foreach { id =>
      val dir = new java.io.File(deltaDir(rootDir), s"batch_$id")
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }

  /** Segmented search: pruned SEISMIC over the base index + exact scan over
    * the delta, merged top-k. With no pruning (heapFactor ≤ 0/∞, topN ≥ |q|)
    * this is EXACTLY the top-k over base ∪ delta (spec invariant); with
    * pruning the delta side is still exact — fresh docs are never less
    * visible than indexed ones, matching the reference's sub-threshold
    * exact-search policy for young segments. */
  def searchSegmented(
      index: SeismicIndex,
      baseCorpus: DataFrame,
      deltaCorpus: DataFrame,
      qTokens: Map[String, Float],
      k: Int = 10,
      topN: Int = 10,
      heapFactor: Float = 1.0f,
      docId: String = "doc_id",
      tokens: String = "tokens"): DataFrame = {
    val baseHits = Seismic.search(index, baseCorpus, qTokens, k, topN, heapFactor, docId, tokens)
    val deltaHits = SparseRetrieval.exactTopK(deltaCorpus, qTokens, k, docId, tokens)
    baseHits.unionByName(deltaHits)
      .orderBy(col("score").desc, col(docId).asc)
      .limit(k)
  }

  // ---------------------------------------------------- IVF (dense) form

  def ivfDir(rootDir: String, v: Long): String = s"$rootDir/ivf_v$v"

  /** Initialize version 0 of a segmented IVF index: base vectors + the
    * cell-partitioned assignments table (nprobe = partition pruning, as in
    * Ann.writeIndex). Centroids are the caller's quantizer — fixed across
    * versions (seeded/data-independent in the oracle-checked form). */
  def initializeIvf(vectors: DataFrame, rootDir: String,
      centroids: Array[Array[Float]], roundDp: Int = 6): Unit = {
    new java.io.File(rootDir).mkdirs()
    vectors.write.mode("overwrite").parquet(baseDir(rootDir, 0))
    val base = vectors.sparkSession.read.parquet(baseDir(rootDir, 0))
    graft.ann.Ann.writeIndex(
      graft.ann.Ann.assign(base, centroids, roundDp = roundDp),
      centroids, ivfDir(rootDir, 0))
    writeVersion(rootDir, 0, -1)
  }

  /** Segmented IVF search: probed-cell scan over the immutable base index
    * + exact brute scan over the (small) delta, merged top-k — same
    * young-segment policy as the SEISMIC form. nprobe = nlist makes the
    * base side exact too (spec invariant: ≡ brute over base ∪ delta). */
  def searchSegmentedIvf(
      assigned: DataFrame,
      centroids: Array[Array[Float]],
      deltaVecs: DataFrame,
      query: Array[Float],
      k: Int = 10,
      nprobe: Int = 4): DataFrame = {
    val baseHits = graft.ann.Ann.ivfTopK(assigned, centroids, query, k, nprobe)
    val deltaHits = graft.ann.Ann.bruteForceTopK(deltaVecs, query, k)
    baseHits.unionByName(deltaHits)
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Re-assign base ∪ delta into version N+1 (fixed quantizer, fresh
    * cell-partitioned layout) and move the pointer — same watermark-based
    * crash-safe retirement as [[compact]]. */
  def compactIvf(spark: SparkSession, rootDir: String,
      centroids: Array[Array[Float]], roundDp: Int = 6): Long = withCompactLock(rootDir) {
    val (v, wm) = versionAndWatermark(rootDir)
    val ids = listBatchIds(rootDir).filter(_ > wm).sorted
    val base = spark.read.parquet(baseDir(rootDir, v))
    val delta =
      if (ids.isEmpty) base.limit(0)
      else spark.read.schema(base.schema)
        .parquet(ids.map(id => s"${deltaDir(rootDir)}/batch_$id"): _*)
    base.unionByName(delta).write.mode("overwrite").parquet(baseDir(rootDir, v + 1))
    val merged = spark.read.parquet(baseDir(rootDir, v + 1))
    graft.ann.Ann.writeIndex(
      graft.ann.Ann.assign(merged, centroids, roundDp = roundDp),
      centroids, ivfDir(rootDir, v + 1))
    val newWm = if (ids.isEmpty) wm else ids.max
    writeVersion(rootDir, v + 1, newWm)
    cleanupRetired(rootDir, newWm)
    v + 1
  }

  /** Streaming maintenance loop: every trigger appends the batch and runs
    * the merge policy — the closed loop from StreamingEnrich's output to a
    * serving-ready index. Enrichment (tokens column) must already be on the
    * stream (chain StreamingEnrich upstream). Pass `checkpoint` in any
    * restartable deployment: batch ids are only monotonic across restarts
    * when the engine's offset log survives, and the replay-overwrite
    * guarantee is keyed on them. */
  def maintain(
      enrichedStream: DataFrame,
      rootDir: String,
      maxDeltaRatio: Double = 0.25,
      nPostings: Int = Seismic.DefaultNPostings,
      trigger: Trigger = Trigger.AvailableNow(),
      checkpoint: Option[String] = None): StreamingQuery = {
    val writer = enrichedStream.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // keyed by the engine's batchId: an at-least-once replay overwrites
        // its own dir instead of appending the rows a second time
        appendBatch(batch, rootDir, batchId)
        val v = currentVersion(rootDir)
        val base = spark.read.parquet(baseDir(rootDir, v))
        val deltaRows = readDelta(spark, rootDir, base).count()
        if (shouldCompact(base.count(), deltaRows, maxDeltaRatio)) {
          compact(spark, rootDir, nPostings)
          ()
        }
      }
    checkpoint.fold(writer)(cp => writer.option("checkpointLocation", cp)).start()
  }
}
