package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: sub-stage timing for the minhash dedup pipeline. */
object ProfileParts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[parts] $name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    // warmup whole query once
    graft.dedup.Dedup.minhashLsh(docs).write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      import graft.dedup.Dedup
      val shCol = classOf[Dedup.type]
      // replicate internals
      val params = Dedup.hashParams(32, 42L)
      val sigUdf = udf((sh: Seq[String]) => Dedup.minhashSignature(sh.toSet, params))
      val shUdf = udf((s: String) => Dedup.shingles(s, 3).toSeq)
      val withSh = docs.select(col("doc_id").as("id"), shUdf(col("text")).as("sh"))
      time("shingles count")(withSh.write.format("noop").mode("overwrite").save())
      val persisted = withSh.persist()
      time("persist materialize")(persisted.count())
      val sigs = persisted.select(col("id"), sigUdf(col("sh")).as("sig"))
      time("signatures")(sigs.write.format("noop").mode("overwrite").save())
      val banded = sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(7)), b =>
          xxhash64(lit("band"), b, slice(col("sig"), b * lit(4) + 1, lit(4))))).as(Seq("band", "bucket")))
      time("banded")(banded.write.format("noop").mode("overwrite").save())
      val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
      val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
      val candidates = l.join(r, Seq("band", "bucket"))
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
        .dropDuplicates("id_a", "id_b")
      time("candidates")(candidates.write.format("noop").mode("overwrite").save())
      time("full minhashLsh")(Dedup.minhashLsh(docs).write.format("noop").mode("overwrite").save())
      persisted.unpersist()
    }
    spark.stop()
  }
}
