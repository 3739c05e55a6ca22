package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing harness for the prefix-filter dedup pipeline. Two lessons
  * it caught (keep for regressions):
  *   - a downstream global sort SAMPLES its child for range boundaries and
  *     executes an unpersisted pipeline TWICE (35 s vs 19 s) — the final
  *     pair relation is persisted inside ngramJaccardPairsPrefix for this;
  *   - sibling stages of one action race to populate a shared persist —
  *     the shingle cache is count()-materialized before the fan-out.
  */
object ProfilePrefix {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pp] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to 2).foreach { i =>
      time(s"direct function (pass $i)") {
        graft.dedup.Dedup.ngramJaccardPairsPrefix(docs, threshold = 0.5)
          .write.format("noop").mode("overwrite").save()
      }
    }
    (1 to 2).foreach { i =>
      time(s"query closure (pass $i)") {
        SparkEntry.queries("q_dedup_ngram_prefix")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    SparkEntry.queries("q_dedup_ngram_prefix")(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
