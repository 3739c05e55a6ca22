package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared per-batch cluster-assignment fold for the streaming dedup legs
  * ([[MinhashIndex.ingestStreamClustered]] and its winnow/embedding
  * siblings). The fold is LEG-AGNOSTIC — it consumes (id_a, id_b) pairs,
  * so any near-duplicate pair producer plugs in (the reference's ingest
  * processors are similarly chained per flush regardless of which
  * fingerprint produced the match, e.g.
  * processor/TextEmbeddingProcessor.java:79 runs per indexed batch).
  *
  * Storage: versioned parquet snapshots `v<epoch>` under `clustersDir`
  * with a CURRENT pointer published via the atomic-rename meta file
  * ([[IndexMeta]]); [[currentClusters]] reads the pointed-at version.
  *
  * At-least-once hardening (ADVICE round 12, all three findings):
  *
  *  - REPLAYED EPOCH: if CURRENT already names `v<epoch>`, the publish is
  *    skipped outright — the fold is idempotent (CC(star(CC(E ∪ P)) ∪ P)
  *    = CC(E ∪ P)), and recomputing would build a write plan whose INPUT
  *    path (prev = the pointed-at version) equals its OUTPUT path, which
  *    Spark rejects ("Cannot overwrite a path that is also being read
  *    from") — wedging the stream permanently. The caller still redoes
  *    its index appends, which the read-side dedups absorb.
  *  - POINTER READ FAILURES: only FileNotFoundException (pointer
  *    genuinely absent — first epoch) maps to "no assignment yet". Any
  *    other IO error RETHROWS so the batch fails and the checkpoint
  *    retries, instead of silently folding against an empty prev and
  *    publishing a truncated assignment that discards all prior state.
  *  - VERSION GC: after a publish, snapshots other than the new CURRENT
  *    and its immediate predecessor are deleted (the predecessor stays
  *    for in-flight readers that resolved the pointer just before the
  *    flip) — a long-running stream holds ≤ 2 snapshots, not
  *    O(epochs × corpus) unbounded growth.
  */
private[graft] object ClusterFold {

  /** The version CURRENT names, None ONLY when the pointer file is
    * genuinely absent. Transient filesystem errors propagate (see class
    * doc — mapping them to None would truncate the assignment). */
  def currentVersion(clustersDir: String): Option[String] =
    try Some(IndexMeta.read(clustersDir, "CURRENT")(0))
    catch { case _: java.io.FileNotFoundException => None }

  /** The live (id, cluster_id) assignment — equals whole-corpus
    * `resolveClusters(pairs(seen corpus))` at every publish point. */
  def currentClusters(spark: SparkSession, clustersDir: String): DataFrame =
    spark.read.parquet(s"$clustersDir/${currentVersion(clustersDir).getOrElse(
      throw new IllegalStateException(s"no published assignment under $clustersDir"))}")

  private def emptyAssignment(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cluster_id",
          org.apache.spark.sql.types.LongType))))

  /** Fold one batch's verified pairs into the versioned assignment:
    * star edges from the prior snapshot + the batch's pairs →
    * [[Dedup.resolveClustersIncremental]] → publish `v<epoch>` and flip
    * CURRENT atomically — per-batch work is bounded by
    * |batch| + |assignment| + |new pairs|. No-op on a replayed epoch. */
  def foldBatch(spark: SparkSession, clustersDir: String, epoch: Long,
      pairs: DataFrame, batchIds: DataFrame): Unit = {
    val vNew = s"v$epoch"
    val cur = currentVersion(clustersDir)
    if (cur.contains(vNew)) return // replayed epoch — already published
    val (prev, allIds) = cur match {
      case Some(v) =>
        val p = spark.read.parquet(s"$clustersDir/$v")
        (p, p.select(col("id")).unionByName(batchIds).distinct())
      case None => (emptyAssignment(spark), batchIds)
    }
    val next = Dedup.resolveClustersIncremental(
      prev, pairs.select(col("id_a"), col("id_b")), allIds)
    next.write.mode("overwrite").parquet(s"$clustersDir/$vNew")
    IndexMeta.write(clustersDir, "CURRENT", Seq(vNew))
    gc(clustersDir, keep = Set(vNew) ++ cur)
  }

  /** Delete superseded snapshot dirs (everything `v<digits>` not in
    * `keep`). Runs on the Hadoop FS API like [[IndexMeta]], so the same
    * code GCs local dirs and cluster stores. */
  private def gc(clustersDir: String, keep: Set[String]): Unit = {
    val d = new org.apache.hadoop.fs.Path(clustersDir)
    val fs = d.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (!fs.exists(d)) return
    fs.listStatus(d).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.matches("v\\d+") && !keep.contains(n)) {
        fs.delete(st.getPath, true)
        ()
      }
    }
  }
}
