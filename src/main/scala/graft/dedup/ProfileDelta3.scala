package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (round 17): sanity-check the MetricsListener input-bytes
  * counter against a known-size parquet scan, plain vs through the
  * writeRel-shaped repartition+write, vs a broadcast-join read — decides
  * whether the clampread cell's probe_read_kb can be trusted before
  * SCALE.md claims a slope from it. */
object ProfileDelta3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val metrics = new graft.ScaleBench.MetricsListener
    spark.sparkContext.addSparkListener(metrics)
    val dir = java.nio.file.Files.createTempDirectory("pd3").toFile
    dir.deleteOnExit()
    val p = s"${dir.getAbsolutePath}/data"
    // ~1M rows of incompressible longs ≈ 13-16 MB on disk
    spark.range(1000000).select(
      shiftleft(xxhash64(col("id")), 3).as("id"),
      xxhash64(col("id"), lit(7)).as("cluster_id"))
      .coalesce(1).write.mode("overwrite").parquet(p)
    val sz = new java.io.File(p).listFiles.map(_.length).sum / 1024
    println(s"[pd3] on-disk KB=$sz")

    metrics.reset()
    val n1 = spark.read.parquet(p).count()
    println(s"[pd3] plain count rows=$n1 " + metrics.snapshot().filter(_._1.contains("kb")).toSeq.sorted)

    metrics.reset()
    val n2 = spark.read.parquet(p)
      .agg(max(col("id")), max(col("cluster_id"))).head()
    println(s"[pd3] full-column agg " + metrics.snapshot().filter(_._1.contains("kb")).toSeq.sorted)

    // enumerate every storage-statistics scheme + counter
    {
      import scala.jdk.CollectionConverters._
      org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics.iterator().asScala.foreach { st =>
        val vals = st.getLongStatistics.asScala.map(e => s"${e.getName}=${e.getValue}").mkString(" ")
        println(s"[pd3] scheme=${st.getScheme} $vals")
      }
      def procIoLines(): Seq[String] = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get("/proc/self/io")).asScala.toSeq
      }
      def rchar(): Long = procIoLines()
        .find(_.startsWith("rchar")).map(_.split("\\s+")(1).toLong).getOrElse(-1L)
      val r0 = rchar()
      val n4 = spark.read.parquet(p).agg(max(col("id"))).head()
      println(s"[pd3] proc rchar delta for one full scan: ${(rchar() - r0)/1024} KB")
      println("[pd3] " + procIoLines().mkString(" | "))
    }
    metrics.reset()
    import spark.implicits._
    val probe = broadcast(Seq(1L, 2L, 3L).toDF("id"))
    val n3 = spark.read.parquet(p).join(probe, Seq("id"), "left_anti")
      .withColumn("pb", lit(0))
      .repartition(col("pb"))
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/out")
    println(s"[pd3] writeRel-shaped " + metrics.snapshot().filter(_._1.contains("kb")).toSeq.sorted)
    spark.stop()
  }
}
