package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{ClusterFold, Dedup, EmbeddingIndex, MinhashIndex, WinnowIndex}

/** Streaming dedup-to-clusters scale cells (VERDICT r13 tasks #1/#3/#5):
  * measure the `ingestStreamClustered` loop — per-batch wall and
  * read/write bytes — as the SEEN CORPUS grows, on all three legs.
  *
  * Three cell families:
  *
  *  - `probe` (task #1's done-criterion): pre-seed the index AND the
  *    cluster assignment from a ×f corpus (disjoint replication for the
  *    text legs — near-dup density preserved, assignment grows ~×f;
  *    vecrand for the embedding leg — distinct vectors, the fixed-nbits
  *    regime), then stream a FIXED 4-batch probe of fresh-id near-dup
  *    docs and record per-epoch wall + total input/output bytes. The r13
  *    layout rewrote the whole assignment per epoch (bytes grow ×f); the
  *    r14 partitioned fold reads/writes only touched partitions (bytes
  *    ~flat in f).
  *  - `aging` (task #5): stream the ×1 corpus from an EMPTY index in
  *    fixed-size micro-batches and log wall per epoch — the within-run
  *    corpus-age curve (an O(corpus-age) publish shows as a linear ramp;
  *    O(touched) stays flat apart from cluster-density noise).
  *  - `gatevar` (task #3): run the q_stream_dedup_clusters_embedding GATE
  *    verbatim N times in one process, logging wall + per-epoch durations
  *    + phys counters, to bound the same-code spread the r13 verdict
  *    flagged (6.8 s builder vs 10.6 s driver).
  *
  * Round-15 additions:
  *
  *  - `probesplit` (VERDICT r14 watch #4): embedding-leg BATCH probe at
  *    ×f with the production autoParts grid CURVE (constant partition
  *    size via a test-scale target, count growing with rows — not a
  *    fixed fan-out), read bytes split into the pure index-read floor
  *    ([[EmbeddingIndex.postingsSlice]] — the pruned postings scan) vs
  *    the candidate-driven remainder (sketches of candidate gids).
  *  - `aging` rows now carry snapshot-debris counters (VERDICT r14 task
  *    #6): total data files + distinct epoch dirs under the clusters
  *    snapshot and manifest entry count at end of stream.
  *  - `gatevar_q` selects the gate the gatevar cell re-runs (drift
  *    watches on non-streaming gates, e.g. q_dedup_embedding_delta).
  *
  *  - `clampcurve`: per-epoch publish cost PAST the autoParts clamp
  *    (toy grid) — write bytes bounded by the touched partition, GC ops
  *    O(touched), zero-pair epochs zero-IO, vs the full-rewrite
  *    equivalent the pre-r15 cliff paid (logged per row).
  *
  * Usage: runMain graft.StreamCurve [cells=probe,aging,gatevar,probesplit,clampcurve]
  *   [legs=minhash,winnow,embedding] [factors=1,10,30] [batches=20]
  *   [gatevar_n=3] [gatevar_q=q_stream_dedup_clusters_embedding]
  * Writes /tmp/graftscale/stream_curve.json.
  */
object StreamCurve {

  /** Probe-cell seeding uses a TOY-scale grid target so the assignment's
    * partition count scales with the corpus at test sizes (the production
    * autoParts target of 256k rows would pin every test assignment to the
    * 8-partition floor, and per-partition size — not the fold — would
    * dominate the byte curve). */
  private val SeedTargetRows = 256L

  /** Seed-fold epoch for probe cells: must never collide with the
    * streamed probe's batch ids (0..3) or the fold's replayed-epoch skip
    * silently no-ops the colliding batch (ADVICE r14). */
  private val SeedEpoch = 1000000L

  private final class BatchDurations
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    override def onQueryStarted(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
      buf.add((e.progress.batchId, e.progress.batchDuration)); ()
    }
    override def onQueryTerminated(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    def drain(): Seq[(Long, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var v = buf.poll()
      while (v != null) { out += v; v = buf.poll() }
      out.toSeq.sortBy(_._1)
    }
  }

  private def rmrf(p: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(p))
  }

  private def jnum(d: Double): String = f"$d%.2f"

  /** Count parquet data files under `dir` (recursive). */
  private def dataFiles(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(dir))
  }

  def main(args: Array[String]): Unit = {
    val argMap = args.flatMap { a =>
      a.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
    }.toMap
    val cells = argMap.getOrElse("cells", "probe,aging,gatevar").split(",").toSeq
    val legs = argMap.getOrElse("legs", "minhash,winnow,embedding").split(",").toSeq
    val factors = argMap.getOrElse("factors", "1,10,30").split(",").map(_.toInt).toSeq
    val agingBatches = argMap.getOrElse("batches", "20").toInt
    val gatevarN = argMap.getOrElse("gatevar_n", "3").toInt
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new ScaleBench.MetricsListener
    spark.sparkContext.addSparkListener(metrics)
    val durations = new BatchDurations
    spark.streams.addListener(durations)

    // delivered-CPU-speed anchor per cell ([[ScaleBench.cpuRefMops]] — the
    // r16 bisect lesson: the host drifts ±20% between windows invisibly
    // to jiffy probes; every cell row's wall must be interpretable
    // against the clock the host actually delivered)
    val hostRef = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def refMark(label: String): Unit = {
      hostRef += ((label, ScaleBench.cpuRefMops())); ()
    }

    val docsAll = spark.read.parquet(s"$srcDir/documents.parquet")
    val nSrcDocs = docsAll.agg(max(col("doc_id"))).head().getLong(0) + 1
    val embAll = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val nSrcVecs = embAll.agg(max(col("vec_id"))).head().getLong(0) + 1

    val out = new StringBuilder
    out.append("{\n")
    val sections = scala.collection.mutable.ArrayBuffer.empty[String]

    /** One probe/aging run: seed (optional), write probe files, stream,
      * return (wall, perBatchMs, phys, assignmentRows). */
    def runStream(leg: String, root: String, probeDir: String,
        schema: org.apache.spark.sql.types.StructType): (Double, Seq[Long], Map[String, Long]) = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(probeDir)
      durations.drain()
      metrics.reset()
      val t0 = System.nanoTime()
      leg match {
        case "minhash" => MinhashIndex.ingestStreamClustered(
          stream, s"$root/index", s"$root/clusters", threshold = 0.5)
        case "winnow" => WinnowIndex.ingestStreamClustered(
          stream, s"$root/index", s"$root/clusters",
          minShared = Queries12.WinnowMinShared)
        case "embedding" => EmbeddingIndex.ingestStreamClustered(
          stream, s"$root/index", s"$root/clusters", threshold = 0.45)
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val phys = metrics.snapshot()
      (wall, durations.drain().map(_._2), phys)
    }

    // ------------------------------------------------------------- probe
    if (cells.contains("probe")) {
      refMark("probe")
      val rows = scala.collection.mutable.ArrayBuffer.empty[String]
      for (leg <- legs; f <- factors) {
        val mode = if (leg == "embedding") "vecrand" else "disjoint"
        val dir = s"/tmp/graftscale/$mode/x$f"
        ScaleBench.replicate(spark, srcDir, dir, f, mode)
        val root = s"/tmp/graftstream/probe_${leg}_x$f"
        rmrf(root); new java.io.File(root).mkdirs()
        val nPart = math.min(64 * f, 2048)
        val cl = s"$root/clusters"
        // seed index + assignment from the full x-f corpus (untimed)
        val probeDir = s"$root/probe"
        val (schema, seedRows) = leg match {
          case "embedding" =>
            val emb = spark.read.parquet(s"$dir/embeddings.parquet").persist()
            val nVec = emb.count()
            // PROBE-SCALED resolution (the production lever): a fixed
            // nbits=4 grid holds 16 buckets/table at ANY corpus size, so a
            // x30 vecrand corpus makes every bucket quadratically hot —
            // the first r14 probe cut used the gate's nbits=4 and spilled
            // the disk at x30. writeScaled bounds bucket populations; the
            // seed pair op uses the same scaled nbits.
            EmbeddingIndex.writeScaled(emb, s"$root/index", dim = 64,
              tables = 8, nPart = nPart)
            val pairs = Dedup.embeddingNearDupLsh(emb, dim = 64,
              threshold = 0.45, nbits = EmbeddingIndex.scaledNbits(nVec),
              tables = 8)
              .select(col("id_a"), col("id_b"))
            // seed epoch = sentinel: stream batch ids start at 0 and the
            // fold skips a replayed epoch, so a 0 seed would swallow the
            // probe's first batch (ADVICE r14)
            ClusterFold.foldBatch(spark, cl, SeedEpoch, pairs,
              emb.select(col("vec_id").as("id")), targetRows = SeedTargetRows)
            (0 until 4).foreach { j =>
              emb.where(col("vec_id") % 100 === j && col("vec_id") < nSrcVecs)
                .withColumn("vec_id",
                  col("vec_id") + lit(2000000000L) + lit(j.toLong) * nSrcVecs)
                .repartition(1).write.mode("append").parquet(probeDir)
            }
            emb.unpersist(blocking = false)
            (emb.schema, ClusterFold.readManifest(cl).get.rows)
          case _ =>
            val docs = spark.read.parquet(s"$dir/documents.parquet")
            val pairs = leg match {
              case "minhash" =>
                MinhashIndex.write(docs, s"$root/index", nPart = nPart)
                Dedup.minhashLsh(docs, threshold = 0.5)
                  .select(col("id_a"), col("id_b"))
              case "winnow" =>
                WinnowIndex.write(docs, s"$root/index",
                  k = Queries12.WinnowK, w = Queries12.WinnowW, nPart = nPart)
                Dedup.winnowPairs(docs, k = Queries12.WinnowK,
                  w = Queries12.WinnowW, minShared = Queries12.WinnowMinShared)
                  .select(col("id_a"), col("id_b"))
            }
            ClusterFold.foldBatch(spark, cl, SeedEpoch, pairs,
              docs.select(col("doc_id").as("id")), targetRows = SeedTargetRows)
            (0 until 4).foreach { j =>
              docs.where(col("doc_id") % 100 === j && col("doc_id") < nSrcDocs)
                .withColumn("doc_id",
                  col("doc_id") + lit(2000000000L) + lit(j.toLong) * nSrcDocs)
                .repartition(1).write.mode("append").parquet(probeDir)
            }
            (docs.schema, ClusterFold.readManifest(cl).get.rows)
        }
        val (wall, perBatch, phys) = runStream(leg, root, probeDir, schema)
        val row = s"""{"leg":"$leg","factor":$f,"seed_assignment_rows":$seedRows,""" +
          s""""wall_s":${jnum(wall)},"per_batch_ms":[${perBatch.mkString(",")}],""" +
          s""""phys":{${phys.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")}}}"""
        rows += row
        println(s"[streamcurve] probe $row")
        rmrf(root)
      }
      sections += s""""probe": [${rows.mkString(",\n  ")}]"""
    }

    // ------------------------------------------------------------- aging
    if (cells.contains("aging")) {
      refMark("aging")
      val rows = scala.collection.mutable.ArrayBuffer.empty[String]
      for (leg <- legs) {
        val root = s"/tmp/graftstream/aging_$leg"
        rmrf(root); new java.io.File(root).mkdirs()
        val probeDir = s"$root/probe"
        val schema = leg match {
          case "embedding" =>
            EmbeddingIndex.write(embAll.limit(0), s"$root/index",
              dim = 64, nbits = 4, tables = 8)
            (0 until agingBatches).foreach { j =>
              embAll.where(pmod(col("vec_id"), lit(agingBatches)) === j)
                .repartition(1).write.mode("append").parquet(probeDir)
            }
            embAll.schema
          case _ =>
            if (leg == "minhash")
              MinhashIndex.write(docsAll.limit(0), s"$root/index")
            else WinnowIndex.write(docsAll.limit(0), s"$root/index",
              k = Queries12.WinnowK, w = Queries12.WinnowW)
            (0 until agingBatches).foreach { j =>
              docsAll.where(pmod(col("doc_id"), lit(agingBatches)) === j)
                .repartition(1).write.mode("append").parquet(probeDir)
            }
            docsAll.schema
        }
        val (wall, perBatch, phys) = runStream(leg, root, probeDir, schema)
        // snapshot-debris counters (VERDICT r14 task #6): the per-epoch
        // O(touched) publish leaves untouched partitions referencing old
        // epoch dirs — count how many distinct dirs/files a long stream
        // accumulates (per-fold READS never list the tree; this measures
        // directory clutter, the input to a compact-the-snapshot decision).
        // ON-DISK dirs are the debris measure (they include the
        // predecessor-retained copies and any crashed-publish orphans the
        // manifest no longer references); the manifest count is the live
        // reference set for contrast.
        val m = graft.dedup.ClusterFold.readManifest(s"$root/clusters").get
        val onDiskDirs = Option(new java.io.File(s"$root/clusters").listFiles())
          .map(_.count(f => f.isDirectory && f.getName.matches("[ev]\\d+.*")))
          .getOrElse(0)
        val row = s"""{"leg":"$leg","batches":$agingBatches,""" +
          s""""wall_s":${jnum(wall)},"per_batch_ms":[${perBatch.mkString(",")}],""" +
          s""""clusters_files":${dataFiles(s"$root/clusters")},""" +
          s""""clusters_dirs_on_disk":$onDiskDirs,""" +
          s""""clusters_epoch_dirs_referenced":${m.dirsReferenced.size},""" +
          s""""manifest_entries":${m.entries.size},"snapshot_npart":${m.nPart},""" +
          s""""phys":{${phys.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")}}}"""
        rows += row
        println(s"[streamcurve] aging $row")
        rmrf(root)
      }
      sections += s""""aging": [${rows.mkString(",\n  ")}]"""
    }

    // ----------------------------------------------------------- compact
    // task #4's done-criterion: after many small appends the pruned
    // delta read pays per-file open/list cost inside each touched pb dir;
    // the WITH-compaction arm merges leaves every 10 appends and the
    // probe wall/file-count stays flat while the no-compaction arm grows.
    if (cells.contains("compact")) {
      refMark("compact")
      val rows = scala.collection.mutable.ArrayBuffer.empty[String]
      val nAppends = argMap.getOrElse("appends", "100").toInt
      val probe = docsAll.where(col("doc_id") % 100 === 7)
        .withColumn("doc_id", col("doc_id") + lit(3000000000L)).persist()
      probe.count()
      for (arm <- Seq("nocompact", "compact")) {
        val root = s"/tmp/graftstream/compact_$arm"
        rmrf(root); new java.io.File(root).mkdirs()
        val idx = s"$root/index"
        MinhashIndex.write(docsAll, idx)
        (1 to nAppends).foreach { i =>
          MinhashIndex.append(
            docsAll.where(col("doc_id") % 500 === (i % 500))
              .withColumn("doc_id", col("doc_id") + lit(4000000000L) + lit(i.toLong) * 1000000L),
            idx)
          if (arm == "compact" && i % 10 == 0)
            MinhashIndex.compact(spark, idx, maxFiles = 8)
          if (i % 20 == 0 || i == nAppends) {
            metrics.reset()
            val t0 = System.nanoTime()
            MinhashIndex.deltaPairs(spark, idx, probe, threshold = 0.5)
              .write.format("noop").mode("overwrite").save()
            val wall = (System.nanoTime() - t0) / 1e9
            val phys = metrics.snapshot()
            val row = s"""{"arm":"$arm","appends":$i,"probe_wall_s":${jnum(wall)},""" +
              s""""postings_files":${dataFiles(s"$idx/postings")},""" +
              s""""input_read_kb":${phys("input_read_kb")}}"""
            rows += row
            println(s"[streamcurve] compact $row")
          }
        }
        rmrf(root)
      }
      probe.unpersist()
      sections += s""""compact": [${rows.mkString(",\n  ")}]"""
    }

    // --------------------------------------------------------- probesplit
    // VERDICT r14 watch #4: the embedding probe's read bytes grew +82%
    // x10->x30 — attribute it. Per factor, seed a vecrand index on the
    // production autoParts CURVE (partition size pinned at a test-scale
    // target so the count scales with rows instead of sitting at the
    // 8-partition floor the real 256k target would give at test sizes),
    // then measure the SAME near-dup probe batch two ways:
    //   floor  = postingsSlice forced alone (pure pruned index scan)
    //   total  = full deltaPairs (floor + candidate-driven sketch reads)
    // candidate bytes = total - floor. The claim under test: floor stays
    // ~flat in f (pruning works), candidates track match density.
    if (cells.contains("probesplit")) {
      refMark("probesplit")
      val rows = scala.collection.mutable.ArrayBuffer.empty[String]
      val passes = argMap.getOrElse("split_passes", "3").toInt
      for (f <- factors) {
        val dir = s"/tmp/graftscale/vecrand/x$f"
        ScaleBench.replicate(spark, srcDir, dir, f, "vecrand")
        val root = s"/tmp/graftstream/probesplit_x$f"
        rmrf(root); new java.io.File(root).mkdirs()
        val idx = s"$root/index"
        val emb = spark.read.parquet(s"$dir/embeddings.parquet").persist()
        val nVec = emb.count()
        val nPart = graft.dedup.IndexMeta.autoParts(
          nVec * 8, targetRows = 1024L)
        EmbeddingIndex.writeScaled(emb, idx, dim = 64, tables = 8,
          nPart = nPart)
        val probe = emb.where(col("vec_id") % 100 === 0 && col("vec_id") < nSrcVecs)
          .withColumn("vec_id", col("vec_id") + lit(2000000000L)).persist()
        val nProbe = probe.count()
        emb.unpersist(blocking = false)
        def measure(df: () => org.apache.spark.sql.DataFrame): (Double, Long, Long) = {
          val walls = (1 to passes).map { _ =>
            metrics.reset()
            val t0 = System.nanoTime()
            df().write.format("noop").mode("overwrite").save()
            ((System.nanoTime() - t0) / 1e9, metrics.snapshot())
          }
          // wall AND byte counters from the SAME (median-wall) pass: the
          // first pass pays one-time listing/cache effects, so pairing the
          // median wall with the LAST pass's counters mixed measurement
          // regimes in the floor-vs-candidate split (ADVICE r15)
          val (mid, ph) = walls.sortBy(_._1).apply(passes / 2)
          (mid, ph("input_read_kb"), ph.getOrElse("proc_read_kb", 0L))
        }
        val (wFloor, kbFloor, procFloor) = measure(
          () => EmbeddingIndex.postingsSlice(spark, idx, probe))
        val (wTotal, kbTotal, procTotal) = measure(
          () => EmbeddingIndex.deltaPairs(spark, idx, probe, threshold = 0.45))
        val nPairs = EmbeddingIndex.deltaPairs(spark, idx, probe,
          threshold = 0.45).count()
        // proc_* columns (r17): TRUE read bytes via the kernel rchar
        // counter — the input_read_kb columns are retained for continuity
        // with the r15/r16 artifacts but measure parquet FOOTERS only
        // (the r17 instrument finding); the honest floor-vs-candidate
        // split is the proc pair
        val row = s"""{"factor":$f,"n_vec":$nVec,"n_probe":$nProbe,""" +
          s""""npart":$nPart,"floor_wall_s":${jnum(wFloor)},""" +
          s""""total_wall_s":${jnum(wTotal)},"floor_read_kb":$kbFloor,""" +
          s""""total_read_kb":$kbTotal,"candidate_read_kb":${kbTotal - kbFloor},""" +
          s""""proc_floor_read_kb":$procFloor,"proc_total_read_kb":$procTotal,""" +
          s""""proc_candidate_read_kb":${procTotal - procFloor},"pairs":$nPairs}"""
        rows += row
        println(s"[streamcurve] probesplit $row")
        probe.unpersist(blocking = false)
        rmrf(root)
      }
      sections += s""""probesplit": [${rows.mkString(",\n  ")}]"""
    }

    // ---------------------------------------------------------- clampcurve
    // Direct measurement of the r15 clamp fix: fold epochs of fresh
    // 2-member pairs with a TOY grid (targetRows=16, maxParts=8) so the
    // snapshot crosses the compaction threshold (rows > 2*16*8 = 256)
    // within the first epochs and spends the rest of the stream PAST the
    // clamp. Pair ids are confined to one pmod residue per epoch (the
    // production touch pattern: a batch lands in few partitions). The r14
    // code full-rewrote the snapshot out there every epoch (write bytes
    // ramp with stored rows, ~rows*16B); the fix bounds the write to the
    // touched PARTITION (~rows/nPart) and keeps GC ops O(touched) — the
    // row logs both, plus a terminal zero-pair epoch that must stay
    // zero-IO past the clamp.
    if (cells.contains("clampcurve")) {
      refMark("clampcurve")
      import graft.dedup.ClusterFold
      import spark.implicits._
      val epochs = argMap.getOrElse("clamp_epochs", "32").toInt
      val pairsPerEpoch = argMap.getOrElse("clamp_pairs", "2000").toInt
      val root = "/tmp/graftstream/clampcurve"
      rmrf(root); new java.io.File(root).mkdirs()
      val cl = s"$root/clusters"
      val rows = scala.collection.mutable.ArrayBuffer.empty[String]
      (0 to epochs).foreach { e =>
        val ps =
          if (e == epochs) Seq.empty[(Long, Long)].toDF("id_a", "id_b")
          else {
            // both pair sides ≡ e (mod 8): the epoch touches ONE byid and
            // ONE byroot partition of the clamped 8-partition grid
            val base = 1000000L * (e + 1) * 8 + (e % 8)
            (0 until pairsPerEpoch)
              .map(i => (base + 16L * i, base + 16L * i + 8))
              .toDF("id_a", "id_b")
          }
        metrics.reset()
        val t0 = System.nanoTime()
        ClusterFold.foldBatch(spark, cl, e.toLong, ps,
          ps.select(col("id_a").as("id")), targetRows = 16L, maxParts = 8)
        val wall = (System.nanoTime() - t0) / 1e9
        val m = ClusterFold.readManifest(cl).get
        val phys = metrics.snapshot()
        if (e % 4 == 0 || e >= epochs - 1) {
          val row = s"""{"epoch":$e,"stored_rows":${m.rows},"npart":${m.nPart},""" +
            s""""past_clamp":${m.rows > 2L * 16L * m.nPart},"wall_s":${jnum(wall)},""" +
            s""""write_kb":${phys.getOrElse("output_write_kb", 0L)},""" +
            s""""full_rewrite_kb_equiv":${m.rows * 16L / 1024L},""" +
            s""""gc_ops":${ClusterFold.lastGcOps(cl)}}"""
          rows += row
          println(s"[streamcurve] clampcurve $row")
        }
      }
      rmrf(root)
      sections += s""""clampcurve": [${rows.mkString(",\n  ")}]"""
    }

    // ----------------------------------------------------------- backfill
    // VERDICT r15 task #1's done-criterion: an UNTHROTTLED backfill batch
    // (availableNow over a whole corpus = ONE giant pair batch) must not
    // materialize its endpoint ids on the driver. Fold single batches of
    // geometrically growing pair counts past a tiny driver cutoff (the
    // relational over-cutoff path) into a pre-seeded snapshot and log the
    // task-result bytes shipped to the driver. The r15 code collected
    // ~16 B × 2·pairs with NO bound (collected_equiv_kb — ramps forever);
    // the r16 path's only row-scale driver traffic is the SIZE-GATED
    // broadcast of the touched components (≤ 4 M rows): driver bytes grow
    // under the gate, then the join falls back to a shuffle strategy and
    // the curve CAPS — the sizes straddle the gate to show exactly that.
    if (cells.contains("backfill")) {
      refMark("backfill")
      import graft.dedup.ClusterFold
      import spark.implicits._
      val rows = scala.collection.mutable.ArrayBuffer.empty[String]
      val sizes = argMap.getOrElse("backfill_pairs", "500000,2500000,6000000")
        .split(",").map(_.toInt).toSeq
      for (nPairs <- sizes) {
        val root = s"/tmp/graftstream/backfill_$nPairs"
        rmrf(root); new java.io.File(root).mkdirs()
        val cl = s"$root/clusters"
        // seed: disjoint 2-clusters so the backfill has prior state to
        // look up relationally
        val seed = spark.range(5000)
          .select((lit(1000000000L) + col("id") * 2).as("id_a"),
            (lit(1000000000L) + col("id") * 2 + 1).as("id_b"))
        ClusterFold.foldBatch(spark, cl, 0L, seed,
          seed.select(col("id_a").as("id")), targetRows = 4096L)
        // backfill batch: fresh disjoint pairs + 1000 pairs touching the
        // seeded clusters (the found-roots leg), one batch, cutoff 1000
        val batch = spark.range(nPairs)
          .select((lit(2000000000L) + col("id") * 2).as("id_a"),
            (lit(2000000000L) + col("id") * 2 + 1).as("id_b"))
          .unionByName(spark.range(1000)
            .select((lit(1000000000L) + col("id") * 2).as("id_a"),
              (lit(3000000000L) + col("id")).as("id_b")))
        metrics.reset()
        val t0 = System.nanoTime()
        ClusterFold.foldBatch(spark, cl, 1L, batch,
          batch.select(col("id_a").as("id")), targetRows = 4096L,
          maxDriverRows = 1000)
        val wall = (System.nanoTime() - t0) / 1e9
        val phys = metrics.snapshot()
        val m = ClusterFold.readManifest(cl).get
        val row = s"""{"pairs":$nPairs,"stored_rows":${m.rows},""" +
          s""""wall_s":${jnum(wall)},""" +
          s""""result_to_driver_kb":${phys.getOrElse("result_to_driver_kb", -1L)},""" +
          s""""collected_equiv_kb":${nPairs * 2L * 16L / 1024L},""" +
          s""""write_kb":${phys.getOrElse("output_write_kb", 0L)}}"""
        rows += row
        println(s"[streamcurve] backfill $row")
        rmrf(root)
      }
      sections += s""""backfill": [${rows.mkString(",\n  ")}]"""
    }

    // ----------------------------------------------------------- clampread
    // VERDICT r15 task #5, REBUILT per VERDICT r16 task #3: the clamp fix
    // trades per-epoch full rewrites for partitions growing past target,
    // degrading the PRUNED READS linearly in partition size. The r16 cell
    // came back FLAT because sequential toy ids compress to
    // footer-dominated parquet files — so the ids are now INCOMPRESSIBLE
    // (xxhash64-scrambled, residue pinned in the low 3 bits) and the grid
    // grows to millions of rows per partition, where page bytes dominate
    // footers by orders of magnitude. Grow a clamped grid (targetRows=16,
    // maxParts=8 — clamped from the first fold) geometrically, and at
    // each doubling fold a FIXED-SHAPE probe batch (50 genuinely disjoint
    // fresh 2-clusters — hash-scrambled ids, all residue 0; the r16 probe
    // chained into one 51-node component, ADVICE r16 #4), recording its
    // wall + read bytes. Expect reads ~linear in rows-per-partition
    // (never worse), quantifying the runbook's "raise foldMaxParts before
    // the grid clamps" lever.
    if (cells.contains("clampread")) {
      refMark("clampread")
      import graft.dedup.ClusterFold
      import spark.implicits._
      val rows = scala.collection.mutable.ArrayBuffer.empty[String]
      val root = "/tmp/graftstream/clampread"
      rmrf(root); new java.io.File(root).mkdirs()
      val cl = s"$root/clusters"
      var epoch = 0L
      def fold(ps: org.apache.spark.sql.DataFrame): Unit = {
        ClusterFold.foldBatch(spark, cl, epoch, ps,
          spark.emptyDataFrame, targetRows = 16L, maxParts = 8)
        epoch += 1
      }
      // incompressible id: scramble a counter through xxhash64 (unique up
      // to the accepted ~n²/2⁶⁴ collision odds), keep pmod-8 residue
      // controllable in the low 3 bits. Parquet's dictionary falls back to
      // plain on these and snappy finds no runs, so on-disk bytes track
      // row counts — the r16 cell's 5–8 KB footer floor hid the slope.
      def sid(counter: Column, residue: Column): Column =
        shiftleft(xxhash64(lit("clampread"), counter), 3)
          .bitwiseOR(residue.cast("long"))
      // growth batches: disjoint 2-clusters spread over all 8 residues
      // (pair endpoints share a residue, so the per-partition row count
      // grows uniformly across the clamped grid)
      var grown = 0L // rows stored by growth folds
      var counter = 0L // id-space counter (two per growth pair)
      val doublings = argMap.getOrElse("clampread_doublings", "4").toInt
      val batchPairs = argMap.getOrElse("clampread_batch", "250000").toLong
      var target = argMap.getOrElse("clampread_start", "1000000").toLong
      while (rows.size < doublings) {
        while (grown < target) {
          val res = pmod(col("id"), lit(8L))
          fold(spark.range(batchPairs).select(
            sid(lit(counter) + col("id") * 2, res).as("id_a"),
            sid(lit(counter) + col("id") * 2 + 1, res).as("id_b")))
          counter += batchPairs * 2
          grown += batchPairs * 2
        }
        // fixed probe: 50 fresh DISJOINT 2-clusters, all in residue 0 —
        // the probe's pruned reads touch exactly one partition of each
        // relation, whose size is the rows/part under measurement
        val probe = spark.range(50).select(
          sid(lit(9000000000L + epoch * 1024) + col("id") * 2, lit(0)).as("id_a"),
          sid(lit(9000000000L + epoch * 1024) + col("id") * 2 + 1, lit(0)).as("id_b"))
        metrics.reset()
        val t0 = System.nanoTime()
        fold(probe)
        val wall = (System.nanoTime() - t0) / 1e9
        val phys = metrics.snapshot()
        val m = ClusterFold.readManifest(cl).get
        val row = s"""{"stored_rows":${m.rows},"npart":${m.nPart},""" +
          s""""rows_per_part":${m.rows / math.max(1, m.nPart)},""" +
          s""""probe_wall_s":${jnum(wall)},""" +
          s""""probe_read_kb":${phys.getOrElse("input_read_kb", 0L)},""" +
          s""""probe_proc_read_kb":${phys.getOrElse("proc_read_kb", 0L)},""" +
          s""""probe_write_kb":${phys.getOrElse("output_write_kb", 0L)}}"""
        rows += row
        println(s"[streamcurve] clampread $row")
        target *= 2
      }
      rmrf(root)
      sections += s""""clampread": [${rows.mkString(",\n  ")}]"""
    }

    // ----------------------------------------------------------- gatevar
    if (cells.contains("gatevar")) {
      refMark("gatevar")
      val gateQ = argMap.getOrElse("gatevar_q", "q_stream_dedup_clusters_embedding")
      val rows = scala.collection.mutable.ArrayBuffer.empty[String]
      (1 to gatevarN).foreach { i =>
        durations.drain()
        metrics.reset()
        val t0 = System.nanoTime()
        SparkEntry.queries(gateQ)(spark, srcDir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        val phys = metrics.snapshot()
        val perBatch = durations.drain().map(_._2)
        val row = s"""{"q":"$gateQ","run":$i,"wall_s":${jnum(wall)},""" +
          s""""per_batch_ms":[${perBatch.mkString(",")}],""" +
          s""""phys":{${phys.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")}}}"""
        rows += row
        println(s"[streamcurve] gatevar $row")
      }
      sections += s""""gatevar": [${rows.mkString(",\n  ")}]"""
    }

    refMark("end")
    sections += s""""host_cpu_ref_mops": {${hostRef.map { case (l, v) =>
      s""""$l":${jnum(v)}""" }.mkString(",")}}"""
    out.append(sections.mkString(",\n"))
    out.append("\n}\n")
    new java.io.File("/tmp/graftscale").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/graftscale/stream_curve.json"),
      out.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[streamcurve] wrote /tmp/graftscale/stream_curve.json")
    spark.stop()
  }
}
