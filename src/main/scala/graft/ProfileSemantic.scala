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

    val results = scala.collection.mutable.LinkedHashMap.empty[(String, Int), Double]
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
      val variants = Seq(
        "semantic_fixed_nlist" -> Some(8),
        "semantic_scaled_nlist" -> Some(8 * f),
        "semantic_auto" -> None)
      variants.foreach { case (name, nlistOpt) =>
        def force(): Unit =
          (nlistOpt match {
            case Some(nlist) => graft.dedup.Dedup.semanticDedup(emb, dim = 64,
              nlist = nlist, threshold = 0.45)
            case None => graft.dedup.Dedup.semanticDedupAuto(emb, dim = 64,
              targetCluster = 250, threshold = 0.45)
          }).write.format("noop").mode("overwrite").save()
        force() // warmup
        val ts = (1 to passes).map { _ =>
          val t0 = System.nanoTime(); force(); (System.nanoTime() - t0) / 1e9
        }.sorted
        results((name, f)) = ts(passes / 2)
        println(f"[sem] x$f%-3d $name%-22s nlist=${nlistOpt.map(_.toString).getOrElse("auto")}%-4s ${ts(passes / 2)}%7.2fs")
      }
    }
    val names = results.keys.map(_._1).toSeq.distinct
    val lines = names.map { n =>
      val cells = factors.map(f => s""""x$f":${results((n, f))}""").mkString(",")
      val ratio = results((n, factors.last)) / results((n, factors.head))
      s""""$n":{$cells,"ratio_${factors.last}x":$ratio}"""
    }
    val json = s"""{"mode":"semantic","factors":[${factors.mkString(",")}],"queries":{${lines.mkString(",")}}}"""
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/graftscale/scale_results_semantic.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
