package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a subset of driver queries in isolation (same protocol as
  * Bench — full warmup pass, n timed passes, median). Usage:
  *   runMain graft.Profile q_dedup_minhash q_dedup_ngram [passes=5]
  * against SPARK_GRAFT_SF_DIR (default sf0.1). */
object Profile {
  def main(args: Array[String]): Unit = {
    val (passArg, names0) = args.partition(_.startsWith("passes="))
    val passes = passArg.headOption.map(_.stripPrefix("passes=").toInt).getOrElse(5)
    val names = if (names0.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names0.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    try SparkEntry.seismicIndex(spark, sfDir).clusters.count() catch { case _: Throwable => }
    names.foreach(n => try force(n) catch { case e: Throwable => System.err.println(s"[profile] warmup $n: ${e.getMessage}") })
    names.foreach { name =>
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        force(name)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[profile] $name%-28s median=${ts(passes / 2)}%6.2fs min=${ts.head}%6.2fs max=${ts.last}%6.2fs")
    }
    spark.stop()
  }
}
