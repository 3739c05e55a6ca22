package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, EmbeddingIndex}

/** Dev harness (round 12): candidate gate outputs for the capped/scaled
  * embedding-delta gates across the test corpora. */
object ProfileEmb2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val base = emb.where(col("vec_id") % 10 =!= 7)
      val delta = emb.where(col("vec_id") % 10 === 7)
      val nBase = base.count()
      val nb = EmbeddingIndex.scaledNbits(nBase)
      // capped batch (legacy fam, the existing gate family) at a few caps
      val caps = Seq(40, 100)
      val cappedCounts = caps.map { c =>
        c -> Dedup.embeddingNearDupLsh(emb, dim = 64, threshold = 0.45,
          nbits = 4, tables = 8, maxBucket = Some(c)).count()
      }
      // scaled-index delta output
      val root = java.nio.file.Files.createTempDirectory(s"pe2_$sf").toFile
      root.deleteOnExit()
      EmbeddingIndex.writeScaled(base, root.getAbsolutePath, dim = 64,
        targetBucket = 16, minNbits = 4, maxNbits = 12, tables = 8)
      val dp = EmbeddingIndex.deltaPairs(spark, root.getAbsolutePath, delta,
        threshold = 0.45).count()
      // delta at fixed legacy nbits=4 for contrast
      val batchScaledDelta = Dedup.embeddingNearDupLsh(emb, dim = 64,
        threshold = 0.45, nbits = nb, tables = 8, stablePlanes = true)
        .where(col("id_a") % 10 === 7 || col("id_b") % 10 === 7).count()
      println(s"$sf: nBase=$nBase scaledNbits=$nb capped=$cappedCounts " +
        s"scaledDeltaPairs=$dp batchScaledDeltaRestricted=$batchScaledDelta")
    }
    spark.stop()
  }
}
