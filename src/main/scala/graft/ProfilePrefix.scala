package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway stage-timing harness for the prefix-filter dedup pipeline. */
object ProfilePrefix {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val threshold = 0.5

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pp] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }

    import graft.dedup.Dedup
    val sh = docs.select(col("doc_id").as("id"),
        explode(Dedup.shingleColPublic(col("text"), 3)).as("__s"))
      .select(col("id"), xxhash64(col("__s")).as("s"))
      .persist()
    time("shingle+persist")(println("  sh rows: " + sh.count()))
    val shdf = sh.groupBy(col("s")).agg(count(lit(1)).as("__df"))
    time("df groupBy")(println("  distinct shingles: " + shdf.count()))
    val wDoc = Window.partitionBy(col("id"))
    val wOrd = wDoc.orderBy(col("__df").asc, col("s").asc)
    val prefix = sh.join(shdf, "s")
      .select(col("id"), col("s"),
        row_number().over(wOrd).as("__rn"),
        count(lit(1)).over(wDoc).as("__n"))
      .where(col("__rn") <= ceil((lit(1.0) - threshold) * col("__n")) + 1)
      .select(col("id"), col("s"))
      .persist()
    time("prefix window")(println("  prefix rows: " + prefix.count()))
    val pairs = Dedup.bucketPairsPublic(prefix, Seq("s")).persist()
    time("candidate pairs")(println("  pairs: " + pairs.count()))
    val arrs = sh.groupBy(col("id")).agg(sort_array(collect_list(col("s"))).as("hs")).persist()
    time("full arrays")(println("  arrs: " + arrs.count()))
    val verified = Dedup.verifyPairsPublic(pairs, arrs, threshold)
    time("verify")(println("  survivors: " + verified.count()))

    // the REAL query, one action, no intermediate persists — what ScaleBench
    // and Bench actually time
    sh.unpersist(); prefix.unpersist(); pairs.unpersist(); arrs.unpersist()
    time("end-to-end (cold)") {
      Dedup.ngramJaccardPairsPrefix(docs, threshold = threshold)
        .write.format("noop").mode("overwrite").save()
    }
    time("end-to-end (2nd)") {
      Dedup.ngramJaccardPairsPrefix(docs, threshold = threshold)
        .write.format("noop").mode("overwrite").save()
    }
    Dedup.ngramJaccardPairsPrefix(docs, threshold = threshold).explain("formatted")
    spark.stop()
  }
}
