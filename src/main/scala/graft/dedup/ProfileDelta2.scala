package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (round 17, companion to [[ProfileDelta]]): job-level
  * accounting for the REAL capped delta gate — how many Spark jobs the
  * query runs and where wall concentrates. At sf0.1 the relations are
  * thousands of rows, so per-job scheduling floor (~0.1-0.5 s) times the
  * job count IS the query cost — the lever is job/stage count, not
  * per-row compute. */
object ProfileDelta2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    val jobWalls = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs += 1; jobWalls.put(js.jobId, (js.time, 0L))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = jobWalls.get(je.jobId)
        if (s != null) jobWalls.put(je.jobId, (s._1, je.time))
      }
    })

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = emb.where(col("vec_id") % 10 =!= 7)
    val delta = emb.where(col("vec_id") % 10 === 7)
    val root = java.nio.file.Files.createTempDirectory("pd17b").toFile
    root.deleteOnExit()
    val path = root.getAbsolutePath
    EmbeddingIndex.write(base, path, dim = 64, nbits = 4, tables = 8)

    (1 to passes).foreach { p =>
      jobs = 0; jobWalls.clear()
      val t0 = System.nanoTime()
      EmbeddingIndex.deltaPairs(spark, path, delta,
        threshold = 0.45, maxBucket = Some(100))
        .orderBy(col("id_a"), col("id_b"))
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val walls = jobWalls.values.asScala.toSeq
        .collect { case (s, e) if e > 0 => (e - s) / 1e3 }.sorted.reverse
      println(f"[pd2] pass $p wall=$wall%6.2fs jobs=$jobs jobWallSum=${walls.sum}%6.2fs " +
        s"top5=${walls.take(5).map(w => f"$w%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
