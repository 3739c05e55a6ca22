package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** STAGED timing of the prefix-dedup pipeline — times each materialized
  * stage separately so the superlinear component of the ×10 curve can be
  * located instead of guessed (the r9 window flatten moved nothing: the
  * slope lives elsewhere). Mirrors ngramJaccardPairsPrefix stage for
  * stage using the private[graft] accessors; keep in sync. */
object ProfilePrefix2 {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // match ScaleBench's per-factor AQE partition headroom when profiling
      // a replica dir (SPARK_GRAFT_INIT_PARTS=960 for an x30 dir)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pp2] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }

    dirs.foreach { dir =>
      println(s"[pp2] === $dir ===")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val threshold = 0.5
      val sh = time("sh: shingle scan + persist") {
        val s = docs.select(col("doc_id").as("id"),
            explode(Dedup.shingleColPublic(col("text"), 3)).as("__s"))
          .select(col("id"), xxhash64(col("__s")).as("s"))
          .persist()
        s.count(); s
      }
      val arrs = time("arrs: fullArrays groupBy+sort") {
        val a = sh.groupBy(col("id"))
          .agg(sort_array(collect_list(col("s"))).as("hs")).persist()
        a.count(); a
      }
      val reps = time("reps: collapseGroups") {
        val r = arrs.select(col("id"), xxhash64(col("hs")).as("__g"))
          .groupBy(col("__g"))
          .agg(min(col("id")).as("rid"), sort_array(collect_list(col("id"))).as("members"))
          .persist()
        r.count(); r
      }
      val repSh = time("repSh: sh join rep ids") {
        val r = sh.join(reps.select(col("rid").as("id")), "id").persist()
        r.count(); r
      }
      val shdf = time("shdf: df groupBy(s)") {
        val r = repSh.groupBy(col("s")).agg(count(lit(1)).as("__df")).persist()
        r.count(); r
      }
      val prefix = time("prefix: df join + slice") {
        val p = repSh.join(shdf, "s")
          .groupBy(col("id"))
          .agg(sort_array(collect_list(struct(col("__df"), col("s")))).as("__o"))
          .select(col("id"),
            explode(slice(col("__o"), lit(1),
              (ceil((lit(1.0) - threshold) * size(col("__o"))) + 1).cast("int"))).as("__p"))
          .select(col("id"), col("__p.s").as("s"))
          .persist()
        p.count(); p
      }
      println(s"[pp2]   rows: sh=${sh.count()} arrs=${arrs.count()} reps=${reps.count()} " +
        s"repSh=${repSh.count()} shdf=${shdf.count()} prefix=${prefix.count()}")
      val cand = time("cand: bucketPairs(prefix)") {
        val c = Dedup.bucketPairsPublic(prefix, Seq("s")).persist()
        c.count(); c
      }
      println(s"[pp2]   rows: cand=${cand.count()}")
      time("verify: length filter + merge") {
        val v = Dedup.verifyPairsPublic(cand, arrs, threshold).persist()
        println(s"[pp2]   rows: verified=${v.count()}")
        v.unpersist(blocking = false)
      }
      // split the verify cost: the two array joins + length filter alone
      time("verify-joins only (no merge)") {
        cand
          .join(arrs.select(col("id").as("id_a"), col("hs").as("ha")), "id_a")
          .join(arrs.select(col("id").as("id_b"), col("hs").as("hb")), "id_b")
          .withColumn("__na", size(col("ha")).cast("long"))
          .withColumn("__nb", size(col("hb")).cast("long"))
          .where(col("__nb") >= col("__na") * threshold &&
            col("__na") >= col("__nb") * threshold)
          .count()
      }
      Seq(sh, arrs, reps, repSh, shdf, prefix, cand).foreach(_.unpersist(blocking = true))
      (1 to 2).foreach { i =>
        time(s"FULL pipeline (pass $i)") {
          Dedup.ngramJaccardPairsPrefix(docs, threshold = threshold)
            .write.format("noop").mode("overwrite").save()
        }
        spark.sparkContext.getPersistentRDDs.foreach(_._2.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
