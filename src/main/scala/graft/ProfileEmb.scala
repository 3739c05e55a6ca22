package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Dev harness (round 12): embedding-LSH bucket-population statistics on
  * the test corpora — what maxBucket caps and what nbits the scaled write
  * picks, before pinning gate parameters. */
object ProfileEmb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val nd = emb.select(countDistinct(xxhash64(col("embedding")))).head().getLong(0)
    println(s"n=$n distinct=$nd scaledNbits(default)=" +
      graft.dedup.EmbeddingIndex.scaledNbits(n))
    for ((nbits, tables, fam) <- Seq((4, 8, "legacy"), (4, 8, "stable"),
        (graft.dedup.EmbeddingIndex.scaledNbits(n), 8, "stable"))) {
      val planes =
        if (fam == "stable") Dedup.lshPlanesStable(tables, nbits, 64, 42L)
        else Dedup.lshPlanes(tables, nbits, 64, 42L)
      val pops = emb.select(col("vec_id"),
          posexplode(Dedup.lshBucketCol(col("embedding"), planes))
            .as(Seq("table", "bucket")))
        .groupBy("table", "bucket").agg(countDistinct("vec_id").as("pop"))
        .agg(count(lit(1)).as("nbuckets"), max("pop").as("maxpop"),
          expr("percentile(pop, 0.5)").as("p50"),
          expr("percentile(pop, 0.9)").as("p90"),
          expr("percentile(pop, 0.99)").as("p99"))
        .head()
      println(s"fam=$fam nbits=$nbits tables=$tables -> buckets=${pops.getLong(0)} " +
        s"maxpop=${pops.getLong(1)} p50=${pops.getDouble(2)} p90=${pops.getDouble(3)} p99=${pops.getDouble(4)}")
      // pair yield at two thresholds for this family/resolution
      for (th <- Seq(0.45, 0.6)) {
        val cnt = Dedup.embeddingNearDupLsh(emb, dim = 64, threshold = th,
          nbits = nbits, tables = tables, stablePlanes = fam == "stable").count()
        println(s"  pairs@$th = $cnt")
      }
    }
    spark.stop()
  }
}
