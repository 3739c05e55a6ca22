package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Counter-verification input for the SHARED-regime winnow/embedding-LSH
  * scale cells (SCALE.md round 11): computes the base-corpus (×1)
  * fingerprint df statistics that predict the candidate-pair volume the
  * shared fixture induces at factor f. In the shared fixture every doc is
  * replicated verbatim, so a fingerprint with base df = g has df = g·f at
  * factor f and winnowPairs' pair stream carries Σ_gh C(g·f, 2)
  * = (f²·Σg² − f·Σg)/2 rows into its per-pair count shuffle — the
  * arithmetic that must reconcile with the measured phys{} shuffle bytes.
  *
  * Usage: runMain graft.ProfileWinnowStats [src=/root/testdata/sf0.1]
  * Prints one WINNOWSTATS line (and the embedding duplicate-group stats
  * used by the embedding_lsh side of the same derivation).
  */
object ProfileWinnowStats {
  def main(args: Array[String]): Unit = {
    def argOf(key: String, dflt: String): String =
      args.find(_.startsWith(key + "=")).map(_.stripPrefix(key + "=")).getOrElse(dflt)
    val src = argOf("src", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val winnowUdf = udf((s: String) => dedup.Dedup.winnowFingerprints(s, 4, 4))
      val fp = spark.read.parquet(s"$src/documents.parquet")
        .select(col("doc_id").cast("long").as("id"),
          explode(winnowUdf(col("text"))).as("f"))
        .select(col("id"), col("f._2").as("gh"))
        .distinct()
      val dfs = fp.groupBy(col("gh")).agg(count(lit(1)).as("g"))
      val r = dfs.agg(
        sum(col("g")).as("sumG"),
        sum(col("g") * col("g")).as("sumG2"),
        count(lit(1)).as("nHash"),
        max(col("g")).as("maxG")).head()
      val sumG = r.getLong(0); val sumG2 = r.getLong(1)
      println(s"WINNOWSTATS sumG=$sumG sumG2=$sumG2 nHash=${r.getLong(2)} maxG=${r.getLong(3)}")
      Seq(10, 30).foreach { f =>
        val pairs = (f.toLong * f * sumG2 - f.toLong * sumG) / 2
        println(s"WINNOWSTATS predicted candidate pair rows x$f = $pairs")
      }
      // embedding side: distinct-vector groups at ×1 (the collapse keys);
      // in the shared fixture each group's size multiplies by f, the rep
      // relation stays CONSTANT at nDistinct rows, and member expansion is
      // linear in f — the reason lsh shuffle bytes grow ~linearly while
      // emitted pairs grow ~f².
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      val eg = emb.groupBy(xxhash64(col("embedding")).as("h"))
        .agg(count(lit(1)).as("m"))
        .agg(count(lit(1)).as("nGroups"), sum(col("m")).as("nVecs"),
          sum(col("m") * col("m")).as("sumM2")).head()
      println(s"EMBSTATS nGroups=${eg.getLong(0)} nVecs=${eg.getLong(1)} sumM2=${eg.getLong(2)}")
    } finally spark.stop()
  }
}
