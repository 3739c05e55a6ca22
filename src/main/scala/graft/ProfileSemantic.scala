package graft

import org.apache.spark.sql.SparkSession

/** Scaling contrast for [[graft.dedup.Dedup.semanticDedup]]: with a FIXED
  * nlist, cluster populations grow linearly with the corpus and the
  * within-cluster pair step goes quadratic; with nlist SCALED to the corpus
  * (the SemDeDup paper's posture — k=11k on LAION — and the operator's
  * documented 100 TB contract) populations stay bounded and the curve is
  * linear. This harness measures BOTH on the ×1/×3/×10(/×30) disjoint
  * embedding replicas so the contract is a committed artifact, not a
  * docstring claim (the q_ann_ivf / q_ann_ivf_pruned protocol).
  *
  * Usage: runMain graft.ProfileSemantic [factors=1,3,10] [passes=3]
  * Reads /tmp/graftscale/disjoint/xN (ScaleBench replicas; run it first).
  * Writes /tmp/graftscale/scale_results_semantic.json.
  */
object ProfileSemantic {
  def main(args: Array[String]): Unit = {
    def argOf(key: String, dflt: String): String =
      args.find(_.startsWith(key + "=")).map(_.stripPrefix(key + "=")).getOrElse(dflt)
    val factors = argOf("factors", "1,3,10").split(",").map(_.trim.toInt).toSeq
    val passes = argOf("passes", "3").toInt
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

    val results = scala.collection.mutable.LinkedHashMap.empty[(String, Int), Double]
    val physResults = scala.collection.mutable.LinkedHashMap.empty[(String, Int), Map[String, Long]]
    factors.foreach { f =>
      val dir = s"/tmp/graftscale/disjoint/x$f"
      require(new java.io.File(dir, "_DONE").exists(), s"missing replica $dir — run ScaleBench first")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      // semantic_auto is the GATED API (semanticDedupAuto — the probe
      // picks nlist) with production constants: targetCluster=250 over the
      // 2000·f-vector replicas chooses nlist = 8·f, i.e. the same
      // measured-safe shape as the manual scaled curve, but through the
      // code path q_dedup_semantic_scaled oracles (the gate fixture is 500
      // vectors so it pins targetCluster=20 / maxNlist=64; the MECHANISM —
      // one count() scaling nlist with the corpus — is identical).
      // r13 adds the ARGMAX-SHAPE contrast (VERDICT r12 task #4): the
      // max-of-struct aggregation now in Ann.assignByJoin vs the previous
      // rank-window form (re-created here, measurement-only) on the same
      // large-nlist assignment — phys{} shuffle bytes pin the drop (the
      // window sorted all n×nlist cosine rows through one exchange; the
      // aggregation map-side-combines to ~n argmax states)
      val nlistBig = math.max(64, 8 * f)
      val cents = graft.ann.Ann.seededCentroids(nlist = nlistBig, dim = 64)
      def windowAssign(): org.apache.spark.sql.DataFrame = {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        val spark0 = emb.sparkSession
        import spark0.implicits._
        val centsDf = broadcast(
          cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
            .toDF("__ci", "__cvec"))
        val sc = graft.functions.VectorExpressions.dense_cosine(
          col("embedding"), col("__cvec"))
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("__cc").desc, col("__ci").asc)
        emb.crossJoin(centsDf)
          .withColumn("__cc", round(sc, 6))
          .where(col("__cc").isNotNull)
          .withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1)
          .withColumn("centroid_id", col("__ci").cast("int"))
          .withColumn("centroid_cos", col("__cc"))
          .drop("__ci", "__cvec", "__cc", "__rn")
      }
      val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
        "semantic_fixed_nlist" -> (() => graft.dedup.Dedup.semanticDedup(
          emb, dim = 64, nlist = 8, threshold = 0.45)),
        "semantic_scaled_nlist" -> (() => graft.dedup.Dedup.semanticDedup(
          emb, dim = 64, nlist = 8 * f, threshold = 0.45)),
        "semantic_auto" -> (() => graft.dedup.Dedup.semanticDedupAuto(
          emb, dim = 64, targetCluster = 250, threshold = 0.45)),
        "assign_argmax_agg" -> (() => graft.ann.Ann.assignByJoin(
          emb, cents, idCol = "vec_id", roundDp = 6)),
        "assign_argmax_window" -> (() => windowAssign()))
      variants.foreach { case (name, mk) =>
        def force(): Unit =
          mk().write.format("noop").mode("overwrite").save()
        force() // warmup
        val byPass = (1 to passes).map { _ =>
          metrics.reset()
          val t0 = System.nanoTime(); force()
          ((System.nanoTime() - t0) / 1e9, metrics.snapshot())
        }
        val ts = byPass.map(_._1).sorted
        results((name, f)) = ts(passes / 2)
        physResults((name, f)) = byPass.head._2.keys.map { k =>
          val vs = byPass.map(_._2(k)).sorted
          k -> vs(passes / 2)
        }.toMap
        val ph = physResults((name, f))
        println(f"[sem] x$f%-3d $name%-22s ${ts(passes / 2)}%7.2fs shr=${ph("shuffle_read_mb")}%dMB shw=${ph("shuffle_write_mb")}%dMB")
      }
    }
    val names = results.keys.map(_._1).toSeq.distinct
    val lines = names.map { n =>
      val cells = factors.map(f => s""""x$f":${results((n, f))}""").mkString(",")
      val ratio = results((n, factors.last)) / results((n, factors.head))
      val physStr = factors.map { f =>
        val p = physResults((n, f))
        s""""x$f":{${p.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")}}"""
      }.mkString(",")
      s""""$n":{$cells,"ratio_${factors.last}x":$ratio,"phys":{$physStr}}"""
    }
    val json = s"""{"mode":"semantic","factors":[${factors.mkString(",")}],"queries":{${lines.mkString(",")}}}"""
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/graftscale/scale_results_semantic.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
