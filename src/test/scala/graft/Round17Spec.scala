package graft

import org.apache.spark.sql.functions._

import graft.dedup.{ClusterFold, Dedup, EmbeddingIndex, IndexMeta,
  MinhashIndex}
import graft.functions.VectorExpressions

/** Round-17 pins (VERDICT r16 tasks #4, #6, #7 + ADVICE r16):
  *
  *  - the byte-quantized prefilter NEVER drops a true pair: for
  *    adversarial vector families (near-threshold perturbations, zero
  *    vectors, spiky large-component vectors, antipodal pairs) the
  *    quantized-cosine upper bound [[Dedup.quantKeepCond]] keeps every
  *    pair the exact 6-dp-rounded cosine keeps, and the full pipelines
  *    are output-identical with the prefilter on or off;
  *  - the create-exclusive stream lock: a second live stream (different
  *    owner token) on a locked dir throws, the same owner retakes its own
  *    stale lock hands-free, and a token-checked unlock cannot release a
  *    lock another session re-took;
  *  - the publish protocol survives crash injection at its step
  *    boundaries (PREVIOUS write → CURRENT write → GC): simulated
  *    crash states (PREVIOUS overwritten with CURRENT, orphan epoch-dir
  *    debris, replayed epochs) never lose a live leaf — the assignment
  *    stays ≡ whole-corpus resolveClusters after every subsequent fold —
  *    and [[ClusterFold.sweep]] removes the debris without touching live
  *    data.
  */
class Round17Spec extends SparkSpec {
  import spark.implicits._

  private def tmpPath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"r17_$tag").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  private def pairsDF(ps: Seq[(Long, Long)]) = ps.toDF("id_a", "id_b")

  private def assignSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  // ------------------------------------------------ quantized prefilter

  /** Adversarial vector corpus: base random vectors plus near-threshold
    * perturbations of each (cosines cluster around the test threshold),
    * spiky vectors (one huge component — worst case for a per-vector
    * ceiling), zero vectors, negated (antipodal) copies. */
  private def advVectors(seed: Long, n: Int, dim: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val nm = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(x => (x / nm).toFloat)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Float])]
    var id = 0L
    (0 until n).foreach { _ =>
      val b = unit()
      out += ((id, b.toSeq)); id += 1
      // perturbation sized so cos(b, b') lands near cos θ for θ drawn
      // around the threshold angle — the margin's danger zone
      val eps = (0.05 + rnd.nextDouble() * 0.6).toFloat
      val p = unit()
      val pert = b.indices.map(i => b(i) + eps * p(i)).toArray
      out += ((id, pert.toSeq)); id += 1
      if (rnd.nextBoolean()) { out += ((id, b.map(-_).toSeq)); id += 1 }
      if (rnd.nextInt(4) == 0) {
        // spiky: one component dominates (per-vector ceiling ≈ the spike)
        val s = b.clone(); s(rnd.nextInt(dim)) = 5.0f + rnd.nextFloat() * 20f
        out += ((id, s.toSeq)); id += 1
      }
    }
    out += ((id, Seq.fill(dim)(0.0f))); id += 1 // zero vector
    out.toSeq
  }

  test("quant prefilter: the keep bound never drops a pair the exact rounded cosine keeps") {
    val dim = 64
    val vecs = advVectors(seed = 1717L, n = 40, dim = dim)
    val df = vecs.toDF("id", "v")
      .withColumn("nrm", sqrt(VectorExpressions.dense_dot(col("v"), col("v"))))
      .withColumn("__q", Dedup.quantizeVecUdf(col("v")))
      .select(col("id"), col("v"), col("nrm"),
        col("__q._1").as("qv"), col("__q._2").as("qs"))
    val a = df.select(col("id").as("id_a"), col("v").as("v_a"),
      col("nrm").as("n_a"), col("qv").as("q_a"), col("qs").as("s_a"))
    val b = df.select(col("id").as("id_b"), col("v").as("v_b"),
      col("nrm").as("n_b"), col("qv").as("q_b"), col("qs").as("s_b"))
    // all pairs (test corpus is ~150 vectors — 11k pairs, fine locally)
    val pairs = a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(when(col("n_a") === 0.0 || col("n_b") === 0.0, lit(0.0))
          .otherwise(VectorExpressions.dense_dot(col("v_a"), col("v_b")) /
            (col("n_a") * col("n_b"))), 6))
    // sweep thresholds across the cosine range — the bound must hold at
    // every τ, not just the gates' 0.45
    Seq(0.1, 0.45, 0.8, 0.95, 0.999).foreach { tau =>
      val dropped = pairs
        .where(col("cosine") >= tau)
        .where(!Dedup.quantKeepCond(dim, tau,
          col("q_a"), col("s_a"), col("n_a"),
          col("q_b"), col("s_b"), col("n_b")))
        .count()
      assert(dropped == 0L,
        s"prefilter dropped $dropped true pairs at threshold $tau")
    }
    // and it actually FILTERS (not a tautology): well below-threshold
    // pairs are mostly discarded at a high τ
    val totalPairs = pairs.count()
    val kept = pairs.where(Dedup.quantKeepCond(dim, 0.95,
      col("q_a"), col("s_a"), col("n_a"),
      col("q_b"), col("s_b"), col("n_b"))).count()
    assert(kept < totalPairs / 2,
      s"prefilter kept $kept of $totalPairs pairs at τ=0.95 — not selective")
  }

  test("quant prefilter: LSH and delta pipelines are output-identical with the prefilter on") {
    val dim = 16
    val vecs = advVectors(seed = 4242L, n = 30, dim = dim)
      .toDF("vec_id", "embedding")
    val plain = pairSet(Dedup.embeddingNearDupLsh(vecs, dim = dim,
      threshold = 0.6, nbits = 4, tables = 4))
    val quant = pairSet(Dedup.embeddingNearDupLsh(vecs, dim = dim,
      threshold = 0.6, nbits = 4, tables = 4, quantPrefilter = Some(true)))
    assert(plain == quant, "LSH output changed under the prefilter")
    assert(plain.nonEmpty, "degenerate test corpus — no pairs at all")

    val idx = tmpPath("quantidx")
    val base = vecs.where(col("vec_id") % 3 =!= 0)
    val delta = vecs.where(col("vec_id") % 3 === 0)
    EmbeddingIndex.write(base, idx, dim = dim, nbits = 4, tables = 4)
    val dPlain = pairSet(EmbeddingIndex.deltaPairs(spark, idx, delta,
      threshold = 0.6))
    val dQuant = pairSet(EmbeddingIndex.deltaPairs(spark, idx, delta,
      threshold = 0.6, quantPrefilter = Some(true)))
    assert(dPlain == dQuant, "delta output changed under the prefilter")
    assert(dPlain.nonEmpty, "degenerate delta — no pairs at all")
  }

  // ------------------------------------------------ create-exclusive lock

  test("lock: a different owner token fails loudly, the same owner retakes, token-checked unlock releases only its own") {
    val dir = tmpPath("lock17")
    IndexMeta.lock(dir, "checkpointA")
    // different owner: a second live stream — must throw, not steal
    val e = intercept[IllegalStateException] { IndexMeta.lock(dir, "checkpointB") }
    assert(e.getMessage.contains("refused"))
    // token-checked unlock with the WRONG owner is a no-op
    IndexMeta.unlock(dir, "checkpointB")
    assert(IndexMeta.locked(dir), "wrong-owner unlock released the lock")
    // same owner (crashed prior incarnation): retakes hands-free
    IndexMeta.lock(dir, "checkpointA")
    assert(IndexMeta.locked(dir))
    // token-checked unlock with the right owner releases
    IndexMeta.unlock(dir, "checkpointA")
    assert(!IndexMeta.locked(dir))
  }

  test("lock: a second concurrent ingest stream on a locked index dir throws") {
    val all = (0 until 9).map { i =>
      (i.toLong, s"second stream corpus item number ${i / 3} with shared filler words")
    }.toDF("doc_id", "text")
    val srcDir = tmpPath("lock17_src")
    all.repartition(1).write.mode("overwrite").parquet(srcDir)
    val idx = tmpPath("lock17_idx")
    MinhashIndex.write(all.limit(0), idx)
    // another session's live stream (different checkpoint → different
    // owner token) holds the dir
    IndexMeta.lock(idx, "/somewhere/else/_checkpoint")
    val st = spark.readStream.schema(all.schema).parquet(srcDir)
    val e = intercept[IllegalStateException] {
      MinhashIndex.ingestStream(st, idx, tmpPath("lock17_out"), threshold = 0.5)
    }
    assert(e.getMessage.contains("refused"))
    IndexMeta.unlock(idx)
  }

  // --------------------------------------- publish crash-boundary property

  test("publish crash injection: simulated crash states at every step boundary never lose a live leaf; sweep removes only debris") {
    val rnd = new scala.util.Random(170717L)
    val cl = tmpPath("crash17")
    val nIds = 600L
    val universe = (0L until nIds).toDF("id")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var epoch = 0L

    def randomBatch(): Seq[(Long, Long)] =
      (0 until (1 + rnd.nextInt(30))).map { _ =>
        val a = rnd.nextLong(nIds); var b = rnd.nextLong(nIds)
        if (a == b) b = (b + 1) % nIds
        (math.min(a, b), math.max(a, b))
      }

    def manifestFieldsOnDisk(name: String): Option[Seq[Any]] =
      try Some(IndexMeta.read(cl, name).toSeq)
      catch { case _: java.io.FileNotFoundException => None }

    def injectCrashState(): Unit = rnd.nextInt(4) match {
      case 0 =>
        // boundary A: crashed between the PREVIOUS write and the CURRENT
        // flip — on disk PREVIOUS == CURRENT (the re-run epoch's GC delete
        // set must be empty, per the publish doc's write-order argument)
        manifestFieldsOnDisk("CURRENT").foreach(f =>
          IndexMeta.write(cl, "PREVIOUS", f))
      case 1 =>
        // boundary B: crashed between the CURRENT flip and the GC — the
        // deletions never ran, so leaves referenced by NO manifest remain;
        // simulate the orphan leaves directly (parquet content so a wrong
        // GC/sweep keeping them would also be detectable as reads)
        val e = s"e${900 + rnd.nextInt(90)}r${rnd.nextInt(3)}"
        Seq("byid", "byroot").foreach { rel =>
          (0L, 0L) :: Nil // shape doc
          Seq((123456789L, 123456789L)).toDF("id", "cluster_id")
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$cl/$e/$rel/pb=${rnd.nextInt(8)}")
        }
      case 2 =>
        // crashed fold: data written for the NEXT epoch but no publish —
        // the freshDirName collision path must route around it
        Seq((42L, 42L)).toDF("id", "cluster_id")
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$cl/e$epoch/byid/pb=0")
      case 3 => // no injection this round
    }

    def expected(): Set[(Long, Long)] =
      assignSet(Dedup.resolveClusters(pairsDF(seen.toSeq), universe))

    (1 to 14).foreach { _ =>
      injectCrashState()
      val batch = randomBatch()
      seen ++= batch
      ClusterFold.foldBatch(spark, cl, epoch, pairsDF(batch), universe,
        targetRows = 16L, maxParts = 8)
      if (rnd.nextInt(3) == 0) // at-least-once: replay the same epoch
        ClusterFold.foldBatch(spark, cl, epoch, pairsDF(batch), universe,
          targetRows = 16L, maxParts = 8)
      epoch += 1
      assert(assignSet(ClusterFold.currentClustersFull(spark, cl, universe))
        == expected(), s"assignment diverged after epoch ${epoch - 1}")
    }

    // offline sweep: removes the injected debris, keeps every live leaf
    ClusterFold.sweep(cl)
    assert(assignSet(ClusterFold.currentClustersFull(spark, cl, universe))
      == expected(), "sweep deleted a live leaf")
    val fs = new java.io.File(cl)
    val dirs = fs.listFiles().filter(_.isDirectory).map(_.getName).toSet
    val m = ClusterFold.readManifest(cl).get
    val prevDirs = ClusterFold.readManifestFile(cl, "PREVIOUS")
      .map(_.dirsReferenced).getOrElse(Set.empty)
    val live = m.dirsReferenced ++ prevDirs
    assert(dirs.forall(live.contains),
      s"sweep left debris dirs: ${dirs -- live}")
  }
}
