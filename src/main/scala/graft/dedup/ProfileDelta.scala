package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Dev harness (round 17): stage-by-stage wall breakdown of the capped
  * embedding delta path ([[EmbeddingIndex.deltaPairsSketched]]'s phases,
  * re-staged with persist+count barriers — the ProfilePrefix2 protocol).
  * Decides WHERE the byte-quantized prefilter (VERDICT r16 task #6)
  * should cut before any code is written: if the wall is in the
  * candidate/cap machinery rather than the cosine verification joins,
  * a verify-side prefilter cannot move it. */
object ProfileDelta {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = emb.where(col("vec_id") % 10 =!= 7)
    val delta = emb.where(col("vec_id") % 10 === 7)
    println(s"[pd] rows total=${emb.count()} delta=${delta.count()}")

    val root = java.nio.file.Files.createTempDirectory("pd17").toFile
    root.deleteOnExit()
    val path = root.getAbsolutePath
    EmbeddingIndex.write(base, path, dim = 64, nbits = 4, tables = 8)
    val m = EmbeddingIndex.readMeta(path)
    val threshold = 0.45
    val cap = 100 // EmbCap in Queries17

    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[pd] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    (1 to passes).foreach { p =>
      println(s"[pd] ---- pass $p")
      val dSk = EmbeddingIndex.sketchesOf(delta, "embedding", "vec_id").persist()
      val dPost = EmbeddingIndex.postingsOf(dSk, m).persist()
      val postings = timed("sketch+post+prunedread") {
        val x = EmbeddingIndex.readPostingsPruned(spark, path, m, dPost).persist()
        x.count(); x
      }
      val matched = timed("matched") {
        val x = postings.join(
          broadcast(dPost.select(col("table"), col("bucket")).distinct()),
          Seq("table", "bucket")).persist()
        x.count(); x
      }
      val (oldSide, dKept) = timed("cap-pop+hot+antijoins") {
        val pop = matched
          .dropDuplicates("table", "bucket", "gid", "bid")
          .select(col("table"), col("bucket"), col("nm"))
          .unionByName(dPost.select(col("table"), col("bucket"), col("nm")))
          .groupBy(col("table"), col("bucket"))
          .agg(sum(col("nm")).as("__pop"))
        val hot = pop.where(col("__pop") > cap)
          .select(col("table"), col("bucket")).persist()
        hot.count()
        val os = matched.join(broadcast(hot), Seq("table", "bucket"), "left_anti").persist()
        val dk = dPost.join(broadcast(hot), Seq("table", "bucket"), "left_anti").persist()
        os.count(); dk.count(); (os, dk)
      }
      val candGid = timed("candGid") {
        val crossGid = oldSide
          .select(col("table"), col("bucket"), col("gid").as("g_old"))
          .join(broadcast(dKept.select(col("table"), col("bucket"), col("gid").as("g_new"))),
            Seq("table", "bucket"))
          .where(col("g_old") =!= col("g_new"))
          .select(least(col("g_old"), col("g_new")).as("g_a"),
            greatest(col("g_old"), col("g_new")).as("g_b"))
          .dropDuplicates("g_a", "g_b")
        val newNewGid = Dedup.bucketPairsPublic(
          dKept.select(col("table"), col("bucket"), col("gid").as("id")),
          Seq("table", "bucket"))
          .select(col("id_a").as("g_a"), col("id_b").as("g_b"))
        val x = crossGid.unionByName(newNewGid)
          .dropDuplicates("g_a", "g_b").persist()
        println(s"[pd]   candGid rows=${x.count()}")
        x
      }
      val groups = timed("needIdx+groups") {
        val wantGids = candGid.select(col("g_a").as("gid"))
          .unionByName(candGid.select(col("g_b").as("gid")))
          .unionByName(dSk.select(col("gid"))).distinct()
        val needIdx = matched.select(col("gid"))
          .join(broadcast(wantGids), Seq("gid"), "left_semi")
          .distinct().persist()
        val sbs = needIdx.select(
          pmod(col("gid"), lit(m.nPart.toLong)).cast("int").as("sb"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val oldRel = EmbeddingIndex.readSketchesPruned(spark, path, m, sbs)
          .join(broadcast(needIdx), Seq("gid"), "left_semi")
          .groupBy(col("gid"))
          .agg(first(col("v")).as("v"),
            sort_array(array_distinct(flatten(collect_list(col("members")))))
              .as("old_members"))
        val x = oldRel
          .join(dSk.select(col("gid"), col("v").as("v_new"),
            col("members").as("new_members")), Seq("gid"), "full_outer")
          .select(col("gid"), coalesce(col("v"), col("v_new")).as("v"),
            coalesce(col("old_members"), array().cast("array<long>")).as("om"),
            coalesce(col("new_members"), array().cast("array<long>")).as("nm"))
          .withColumn("nrm", sqrt(VectorExpressions.dense_dot(col("v"), col("v"))))
          .persist()
        println(s"[pd]   groups rows=${x.count()}")
        x
      }
      def cosine(va: org.apache.spark.sql.Column, na: org.apache.spark.sql.Column,
          vb: org.apache.spark.sql.Column, nb: org.apache.spark.sql.Column) =
        round(when(na === 0.0 || nb === 0.0, lit(0.0))
          .otherwise(VectorExpressions.dense_dot(va, vb) / (na * nb)), 6)
      val verified = timed("cross-verify(join+cosine)") {
        val x = candGid
          .join(groups.select(col("gid").as("g_a"), col("v").as("v_a"),
            col("nrm").as("n_a"), col("om").as("om_a"), col("nm").as("nm_a")), "g_a")
          .join(groups.select(col("gid").as("g_b"), col("v").as("v_b"),
            col("nrm").as("n_b"), col("om").as("om_b"), col("nm").as("nm_b")), "g_b")
          .withColumn("cosine", cosine(col("v_a"), col("n_a"), col("v_b"), col("n_b")))
          .where(col("cosine") >= threshold).persist()
        println(s"[pd]   surviving cross pairs=${x.count()}")
        x
      }
      timed("expand+collect-count") {
        val cross = verified
          .select(explode(concat(
              Dedup.crossPairsUdf(col("nm_a"), concat(col("om_b"), col("nm_b"))),
              Dedup.crossPairsUdf(col("om_a"), col("nm_b")))).as("p"),
            col("cosine"))
          .select(col("p._1").as("id_a"), col("p._2").as("id_b"), col("cosine"))
        println(s"[pd]   expanded rows=${cross.count()}")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
