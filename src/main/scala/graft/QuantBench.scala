package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.EmbeddingIndex

/** Quantized-prefilter A/B cell (VERDICT r16 task #6 done-criterion,
  * measured honestly in BOTH regimes):
  *
  *  - `gate`: the sf0.1 capped/uncapped delta gates with the prefilter on
  *    vs off — the STAGE-BOUND regime, where the extra slim joins are
  *    expected to cost more than the narrow payload saves (the reason the
  *    prefilter defaults OFF);
  *  - `volume`: a synthetic high-candidate-volume delta (deterministic
  *    hash-derived 64-dim vectors, fixed nbits=4 → bucket populations and
  *    the candidate join grow with the corpus) where verification is the
  *    dominant cost — the 100 TB-shaped regime the prefilter exists for.
  *
  * Writes one JSON (bench/scale_r{N}_quant.json shape) with per-variant
  * median walls + the delivered-CPU anchor around each cell, so a capped
  * host window cannot fake a win. Usage:
  *   SPARK_GRAFT_SF_DIR=… runMain graft.QuantBench [passes=5] [nbase=50000]
  */
object QuantBench {
  def main(args: Array[String]): Unit = {
    val argMap = args.flatMap { a =>
      a.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
    }.toMap
    val passes = argMap.getOrElse("passes", "5").toInt
    val nBase = argMap.getOrElse("nbase", "50000").toLong
    val nDelta = argMap.getOrElse("ndelta", "5000").toLong
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outFile = argMap.getOrElse("out", "/tmp/graftscale/quant_ab.json")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def jnum(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    def medianWall(tag: String)(body: => Long): (Double, Long) = {
      val walls = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        val rows = body
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val med = walls.map(_._1).sorted.apply(passes / 2)
      println(f"[quant] $tag%-28s median=$med%6.2fs rows=${walls.head._2}")
      (med, walls.head._2)
    }

    val sections = scala.collection.mutable.ArrayBuffer.empty[String]

    // ---- gate regime: the real sf0.1 gates, prefilter off vs on
    {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val idxPath = SparkEntry.embeddingIndexPath(spark, sfDir)
      val delta = emb.where(col("vec_id") % 10 === 7)
      val anchor0 = ScaleBench.cpuRefMops()
      val (offW, offN) = medianWall("gate delta quant=off") {
        EmbeddingIndex.deltaPairs(spark, idxPath, delta, threshold = 0.45)
          .count()
      }
      val (onW, onN) = medianWall("gate delta quant=on") {
        EmbeddingIndex.deltaPairs(spark, idxPath, delta, threshold = 0.45,
          quantPrefilter = true).count()
      }
      val anchor1 = ScaleBench.cpuRefMops()
      require(offN == onN, s"gate outputs diverged: $offN vs $onN")
      sections += s""""gate":{"off_s":${jnum(offW)},"on_s":${jnum(onW)},""" +
        s""""rows":$offN,"cpu_ref_mops":[${jnum(anchor0)},${jnum(anchor1)}]}"""
    }

    // ---- volume regime: deterministic pseudo-random corpus, fixed nbits
    // (populations ∝ corpus — the regime the band-bucket caps exist for),
    // candidate volume ~ (nBase/16)·(nDelta/16)·tables pairs
    {
      // hash-derived floats in [-1, 1): engine-deterministic, incompressible
      def vecCol = transform(sequence(lit(0), lit(63)),
        i => ((pmod(xxhash64(col("id"), i), lit(2000001L)) - 1000000L)
          .cast("double") / 1000000.0).cast("float"))
      val base = spark.range(nBase).select(col("id").as("vec_id"),
        vecCol.as("embedding"))
      val delta = spark.range(nBase, nBase + nDelta).select(
        col("id").as("vec_id"), vecCol.as("embedding"))
      val root = java.nio.file.Files.createTempDirectory("quantvol").toFile
      root.deleteOnExit()
      EmbeddingIndex.write(base, root.getAbsolutePath, dim = 64, nbits = 4,
        tables = 8)
      val anchor0 = ScaleBench.cpuRefMops()
      val (offW, offN) = medianWall("volume delta quant=off") {
        EmbeddingIndex.deltaPairs(spark, root.getAbsolutePath, delta,
          threshold = 0.45).count()
      }
      val (onW, onN) = medianWall("volume delta quant=on") {
        EmbeddingIndex.deltaPairs(spark, root.getAbsolutePath, delta,
          threshold = 0.45, quantPrefilter = true).count()
      }
      val anchor1 = ScaleBench.cpuRefMops()
      require(offN == onN, s"volume outputs diverged: $offN vs $onN")
      sections += s""""volume":{"nbase":$nBase,"ndelta":$nDelta,""" +
        s""""off_s":${jnum(offW)},"on_s":${jnum(onW)},"rows":$offN,""" +
        s""""cpu_ref_mops":[${jnum(anchor0)},${jnum(anchor1)}]}"""
    }

    val json = sections.mkString("{", ",", "}")
    new java.io.File(outFile).getParentFile.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[quant] wrote $outFile")
    spark.stop()
  }
}
