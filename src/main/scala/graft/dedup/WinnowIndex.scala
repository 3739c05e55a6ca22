package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Written winnowing-fingerprint index + delta overlap detection — the
  * incremental form of [[Dedup.winnowPairs]] (substring-level verbatim
  * overlap, the Lee et al. substring-dedup / quoted-passage
  * decontamination regime), the [[MinhashIndex]] pattern applied to the
  * fingerprint side.
  *
  * The production question this answers per arriving batch: "does any new
  * document share a verbatim run of ≥ w+k−1 tokens with anything already
  * indexed (or with another new document)?" — without ever re-scanning
  * the indexed corpus's text. Winnowed fingerprints are the RIGHT granule
  * for a delta index: selection keeps ~1/w of grams (sparse, like MinHash
  * bands — not raw shingle postings, whose delta join would inherit the
  * uncapped n-gram join's corpus-hot blowup), and `n_shared` needs no
  * verification payload at all — it IS the per-pair match count of the
  * postings join, so the index stores ONE relation.
  *
  * Layout under `path`: `WINNOW_META` (k, w — a delta can never be
  * fingerprinted with different parameters than the index) and
  * `postings/` — (gh, id), one row per distinct selected fingerprint per
  * doc.
  *
  * Scale shape of [[deltaPairs]] (|delta| ≪ |index|): the delta postings
  * broadcast into one `postings/` scan; per-pair counts aggregate the
  * (delta-bounded) match stream. The index is scanned, never shuffled —
  * the [[MinhashIndex.deltaPairs]] contract. Under `maxDf` the cap is
  * evaluated on the COMBINED (index + delta) document frequency, exactly
  * the full-corpus cap semantics; the hot-key set is regime-tiny and
  * broadcasts into both candidate paths. */
object WinnowIndex {

  /** `nPart`: hash-partition count of the written layout — postings
    * partition on `pb = pmod(gh, nPart)` (gh is already a 64-bit
    * fingerprint hash), so the delta's fingerprint set resolves to
    * partition values on the driver and the per-batch index scan becomes
    * Parquet PARTITION PRUNING instead of a full postings read (the
    * [[graft.sparse.SparseRetrieval.writePostingsIndex]] protocol —
    * VERDICT r12 task #1). 0 = legacy unpartitioned layout. */
  final case class Meta(k: Int, w: Int, nPart: Int = 0)

  private def writeMeta(path: String, m: Meta): Unit =
    IndexMeta.write(path, "WINNOW_META", Seq(m.k, m.w, m.nPart))

  def readMeta(path: String): Meta = {
    val parts = IndexMeta.read(path, "WINNOW_META")
    Meta(parts(0).toInt, parts(1).toInt,
      if (parts.length > 2) parts(2).toInt else 0)
  }

  private def postingsDir(path: String) = s"$path/postings"

  private def pbCol(m: Meta) =
    pmod(col("gh"), lit(m.nPart.toLong)).cast("int").as("pb")

  // shared partitioned-layout writer ([[IndexMeta.writePartitioned]])
  private def writePostings(df: DataFrame, path: String, m: Meta,
      mode: String): Unit =
    IndexMeta.writePartitioned(df, postingsDir(path), path,
      "POSTINGS_SCHEMA", "pb", pbCol(m), m.nPart, mode)

  /** Postings scan pruned to the delta's touched partition values
    * (PartitionFilters at the Parquet scan — plan-pinned in PlansSpec).
    * The pbs collect doubles as the materializing action for the
    * caller-persisted delta caches — callers do not count (VERDICT r13
    * task #2, the [[MinhashIndex]] note). */
  private def readPostingsPruned(spark: SparkSession, path: String, m: Meta,
      dPost: DataFrame): DataFrame =
    if (m.nPart <= 0) { dPost.count(); spark.read.parquet(postingsDir(path)) }
    else {
      val pbs = dPost.select(pbCol(m)).distinct()
        .collect().map(_.getInt(0)).toSeq
      MinhashIndex.prunedPartitionRead(spark, postingsDir(path),
        IndexMeta.anchoredSchema(path, "POSTINGS_SCHEMA"), "pb", pbs)
        .where(col("pb").isin(pbs: _*)).drop("pb")
    }

  private def postingsOf(df: DataFrame, textCol: String, idCol: String,
      m: Meta): DataFrame =
    Dedup.winnowDocArr(df, textCol, idCol, m.k, m.w)
      .select(explode(col("ghs")).as("gh"), col("id"))

  /** Build the index from the (already dedup'd) base corpus. nPart = 0
    * (default) scales the partition count to the written postings
    * ([[IndexMeta.autoParts]]); pass an explicit count to pin it. */
  def write(df: DataFrame, path: String, textCol: String = "text",
      idCol: String = "doc_id", k: Int = 4, w: Int = 4,
      nPart: Int = 0): Unit = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    val m0 = Meta(k, w)
    val postings0 = postingsOf(df, textCol, idCol, m0).persist()
    val m = m0.copy(nPart =
      if (nPart > 0) nPart else IndexMeta.autoParts(postings0.count()))
    writePostings(postings0, path, m, "overwrite")
    postings0.unpersist(blocking = false)
    writeMeta(path, m)
  }

  /** Fold a (checked) delta in so the next delta sees it. */
  def append(delta: DataFrame, path: String, textCol: String = "text",
      idCol: String = "doc_id"): Unit = {
    val m = readMeta(path)
    writePostings(postingsOf(delta, textCol, idCol, m), path, m, "append")
  }

  /** Offline maintenance: merge partition leaves that accumulated more
    * than `maxFiles` append files ([[IndexCompaction]]). Throws while a
    * streaming session holds the index lock — see
    * [[MinhashIndex.compact]]. */
  def compact(spark: SparkSession, path: String, maxFiles: Int = 8): Int = {
    IndexMeta.assertUnlocked(path, "compact")
    compactLeaves(spark, path, maxFiles)
  }

  private def compactLeaves(spark: SparkSession, path: String, maxFiles: Int): Int =
    IndexCompaction.compactDir(spark, postingsDir(path), maxFiles)

  /** Clear a crashed streaming session's stale [[IndexMeta.LockFile]] —
    * see [[MinhashIndex.forceUnlock]]. */
  def forceUnlock(dir: String): Unit = IndexMeta.unlock(dir)

  /** Crash-debris repair for the index's partition leaves
    * ([[IndexCompaction.repairDir]]) — see [[MinhashIndex.repair]]. */
  def repair(path: String): Unit =
    IndexCompaction.repairDir(postingsDir(path))

  /** Winnow pairs (id_a < id_b, n_shared ≥ minShared) touching the delta:
    * old×new from the index postings join, new×new from
    * [[Dedup.winnowPairsFromArr]] over the delta alone (duplicate-set
    * collapse included) — never old×old. Output equals
    * `winnowPairs(base ∪ delta)` restricted to pairs with a delta side
    * (spec-pinned), including under `maxDf`. */
  def deltaPairs(spark: SparkSession, path: String, delta: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      minShared: Int = 1, maxDf: Option[Int] = None): DataFrame = {
    val m = readMeta(path)
    // fingerprint once, not per consumer — the caches fill inside
    // deltaPairsPrepared's first action (the pruned read's pbs collect)
    val dArr = Dedup.winnowDocArr(delta, textCol, idCol, m.k, m.w).persist()
    val dPost = dArr.select(explode(col("ghs")).as("gh"), col("id")).persist()
    val out = deltaPairsPrepared(spark, path, m, dArr, dPost, minShared, maxDf)
    dArr.unpersist(blocking = false)
    dPost.unpersist(blocking = false)
    out
  }

  /** [[deltaPairs]] over a pre-fingerprinted delta — the streaming ingest
    * loop fingerprints each batch ONCE and feeds both the pair search and
    * the index append. Inputs arrive PERSISTED and fill inside the first
    * action here (the pruned read's pbs collect); the caller releases them
    * (the returned relation is materialized before return). */
  private def deltaPairsPrepared(spark: SparkSession, path: String, m: Meta,
      dArr: DataFrame, dPost: DataFrame,
      minShared: Int, maxDf: Option[Int]): DataFrame = {
    require(minShared >= 1, "minShared must be >= 1")
    // partition-pruned index scan: only the delta-touched buckets' files
    val postings = readPostingsPruned(spark, path, m, dPost)

    // every index posting on a delta-shared fingerprint, via ONE scan +
    // broadcast hash join; holds the full index membership of each shared
    // key, so combined df is computable from matched + delta rows alone.
    // Persisted ONLY under maxDf — the uncapped path consumes it exactly
    // once, where caching is pure storage overhead on an index-sized
    // stream (measured ~15% of the ×30 delta cell).
    val matched0 = postings.join(broadcast(dPost.select(col("gh")).distinct()),
      Seq("gh"))
    val matched = if (maxDf.isDefined) matched0.persist() else matched0

    val (oldSide, dKept, hotOpt) = maxDf match {
      case Some(cap) =>
        val dfRel = matched.groupBy(col("gh")).agg(countDistinct(col("id")).as("__di"))
          .join(dPost.groupBy(col("gh")).agg(count(lit(1)).as("__dd")),
            Seq("gh"), "full_outer")
          .select(col("gh"),
            (coalesce(col("__di"), lit(0L)) + coalesce(col("__dd"), lit(0L))).as("__df"))
        // COLLECT the hot set instead of persist+count (r18): bounded by
        // the delta-shared fingerprint set (already broadcast above), so
        // driver residency is unchanged while the LocalRelation broadcasts
        // here and inside winnowPairsFromArr build with ZERO Spark jobs
        // (and its count() probe constant-folds); empty hot skips the
        // anti-joins outright
        import spark.implicits._
        val hotRows = dfRel.where(col("__df") > cap).select(col("gh"))
          .collect().map(_.getLong(0)).toSeq
        val hotLocal = hotRows.toDF("gh")
        (if (hotRows.isEmpty) matched
         else matched.join(broadcast(hotLocal), Seq("gh"), "left_anti"),
          if (hotRows.isEmpty) dPost
          else dPost.join(broadcast(hotLocal), Seq("gh"), "left_anti"),
          Some(hotLocal))
      case None => (matched, dPost, None)
    }

    // countDistinct, not count: n_shared is the DISTINCT shared-fingerprint
    // count, so a replayed append (crash-rerun; any at-least-once writer) —
    // which duplicates every (gh, id) posting of the replayed docs — cannot
    // inflate n_shared past minShared for false pairs (replayed-append ≡
    // once-appended, spec-pinned). Riding the dedup inside the aggregation
    // the pair stream already pays is free; a dropDuplicates on the matched
    // stream would be one extra full shuffle of the slice. Delta-side
    // duplicates cannot exist (winnowDocArr emits distinct hashes per doc).
    val oldNew = oldSide.select(col("gh"), col("id").as("id_old"))
      .join(broadcast(dKept.select(col("gh"), col("id").as("id_new"))), Seq("gh"))
      .where(col("id_old") =!= col("id_new"))
      .groupBy(least(col("id_old"), col("id_new")).as("id_a"),
        greatest(col("id_old"), col("id_new")).as("id_b"))
      .agg(countDistinct(col("gh")).as("n_shared"))
      .where(col("n_shared") >= minShared)
    // hotOpt is a LocalRelation (r18) — nothing to release; it is shared
    // with winnowPairsFromArr as precomputedHot so the capped branch runs
    // zero df groupBys of its own. newNew comes back persisted (the inner
    // finishReleasing's result cache); the outer union is the call's
    // single surviving result cache, so newNew joins the release list.
    // dArr/dPost are caller-owned and NOT released here.
    val newNew = Dedup.winnowPairsFromArr(dArr, minShared, maxDf, hotOpt)
    Dedup.finishReleasing(oldNew.unionByName(newNew),
      Seq(newNew) ++ (if (maxDf.isDefined) Seq(matched) else Nil): _*)
  }

  /** Streaming overlap ingest: every micro-batch is checked against the
    * index ([[deltaPairs]]), its pairs appended under `outDir`, and the
    * batch's postings folded in — [[MinhashIndex.ingestStream]] on the
    * winnow leg. With `maxDf = None` (the default) the emitted pair set is
    * BATCHING-INVARIANT: n_shared is the size of the two docs' fingerprint
    * intersection regardless of when each side arrived, so streaming a
    * whole corpus from an empty index reproduces `winnowPairs(corpus)`
    * however the stream is chopped (spec-pinned; the q_stream_dedup_winnow
    * gate rides q_dedup_winnow's oracle verbatim on this property). A
    * maxDf cap would NOT be batching-invariant — document frequencies
    * evolve as batches land — so it is intentionally not exposed here.
    * foreachBatch is at-least-once: replayed postings are absorbed by the
    * read-side dedup, and replayed pair rows agree (deterministic
    * n_shared) — read `outDir` with dropDuplicates(id_a, id_b). */
  /** The full streaming substring-dedup pipeline: per micro-batch, the
    * arriving docs are checked against the index ([[deltaPairs]]), the
    * batch's postings folded in, AND the cluster assignment incrementally
    * maintained — [[MinhashIndex.ingestStreamClustered]] on the winnow
    * leg. The fold ([[ClusterFold]]) is leg-agnostic (it consumes pairs),
    * and the pair stream here is batching-invariant (n_shared is the two
    * docs' fingerprint-intersection size regardless of arrival order), so
    * streaming a corpus from an empty index publishes the same assignment
    * whole-corpus `resolveClusters(winnowPairs(corpus))` produces — the
    * per-batch CC identity CC(star(CC(E₁)) ∪ E₂) = CC(E₁ ∪ E₂), by
    * induction over batches (spec-pinned). */

  /** `compactEvery` > 0 merges oversized partition leaves every N epochs
    * ([[compact]]) — safe in-loop: foreachBatch is the index's only
    * writer, so the swap's momentary leaf absence has no reader to race;
    * a replayed epoch re-compacts idempotently. 0 = offline-only. */
  def ingestStreamClustered(stream: DataFrame, path: String,
      clustersDir: String, textCol: String = "text", idCol: String = "doc_id",
      minShared: Int = 1, compactEvery: Int = 0,
      foldTargetRows: Long = ClusterFold.TargetRows,
      foldMaxParts: Int = ClusterFold.MaxParts): Unit = {
    val lockOwner = s"$path/_checkpoint"
    IndexMeta.lock(path, lockOwner); IndexMeta.lock(clustersDir, lockOwner)
    try {
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, epoch: Long) =>
          repair(path) // crashed-compact debris (possibly another
          // session's), BEFORE the pruned read: a retired leaf reads as
          // empty and the next append would make the loss permanent
          val m = readMeta(path)
          val dArr = Dedup.winnowDocArr(batch, textCol, idCol, m.k, m.w).persist()
          val dPost = dArr.select(explode(col("ghs")).as("gh"), col("id")).persist()
          val pairs = deltaPairsPrepared(batch.sparkSession, path, m, dArr,
            dPost, minShared, None)
          ClusterFold.foldBatch(batch.sparkSession, clustersDir, epoch, pairs,
            batch.select(col(idCol).cast("long").as("id")).distinct(),
            targetRows = foldTargetRows, maxParts = foldMaxParts)
          writePostings(dPost, path, m, "append")
          if (compactEvery > 0 && (epoch + 1) % compactEvery == 0)
            compactLeaves(batch.sparkSession, path, 8)
          dArr.unpersist(blocking = false)
          dPost.unpersist(blocking = false)
          pairs.unpersist(blocking = false)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$path/_checkpoint")
        .start()
      q.awaitTermination()
    } finally { IndexMeta.unlock(clustersDir, lockOwner); IndexMeta.unlock(path, lockOwner) }
  }

  /** The STORED rows of the assignment maintained by
    * [[ingestStreamClustered]] — members of multi-member clusters only;
    * singletons are implicit ([[ClusterFold.storedClusters]]). */
  def storedClusters(spark: SparkSession, clustersDir: String): DataFrame =
    ClusterFold.storedClusters(spark, clustersDir)

  /** The full relation over `allIds` — stored multi-member clusters plus
    * the implicit singletons (absent id = own cluster). */
  def currentClustersFull(spark: SparkSession, clustersDir: String,
      allIds: DataFrame): DataFrame =
    ClusterFold.currentClustersFull(spark, clustersDir, allIds)

  /** Offline snapshot-debris sweep for the cluster assignment this
    * module's [[ingestStreamClustered]] maintains — deletes every
    * partition leaf/epoch dir referenced by neither CURRENT nor PREVIOUS
    * (the per-publish GC is incremental and a crashed publish can orphan
    * debris only a full listing finds). Run between streaming sessions,
    * like [[compact]]. */
  def sweepClusters(clustersDir: String): Unit = ClusterFold.sweep(clustersDir)

  def ingestStream(stream: DataFrame, path: String, outDir: String,
      textCol: String = "text", idCol: String = "doc_id",
      minShared: Int = 1, compactEvery: Int = 0): Unit = {
    val lockOwner = s"$path/_checkpoint"
    IndexMeta.lock(path, lockOwner)
    try {
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, epoch: Long) =>
          // fingerprint the batch ONCE: the cached relations feed the pair
          // search AND the index append
          repair(path) // crashed-compact debris (possibly another
          // session's), BEFORE the pruned read: a retired leaf reads as
          // empty and the next append would make the loss permanent
          val m = readMeta(path)
          val dArr = Dedup.winnowDocArr(batch, textCol, idCol, m.k, m.w).persist()
          val dPost = dArr.select(explode(col("ghs")).as("gh"), col("id")).persist()
          val pairs = deltaPairsPrepared(batch.sparkSession, path, m, dArr,
            dPost, minShared, None)
          pairs.write.mode("append").parquet(outDir)
          writePostings(dPost, path, m, "append")
          if (compactEvery > 0 && (epoch + 1) % compactEvery == 0)
            compactLeaves(batch.sparkSession, path, 8)
          dArr.unpersist(blocking = false)
          dPost.unpersist(blocking = false)
          pairs.unpersist(blocking = false) // the per-batch result cache
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$path/_checkpoint")
        .start()
      q.awaitTermination()
    } finally IndexMeta.unlock(path, lockOwner)
  }
}
