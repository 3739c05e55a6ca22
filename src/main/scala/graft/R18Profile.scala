package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-18 optimization profiler — the bench methodology (one warmup
  * pass, then 3 timed passes, median per query) over a SUBSET of queries,
  * with per-window host anchors and per-query job accounting on the last
  * pass. Exists because the r17 gate-scale finding (wall hides in driver
  * gaps between jobs) needs per-change A/B cells that are cheaper than the
  * full 161-query bench but share its warmth profile: a cold Catalyst
  * (driver JIT) inflates the gap share 3-6× (measured this round: the
  * same capped delta gate ran 34.6 s → 17.3 s → ~6 s across consecutive
  * invocations at HEALTHY anchors and ~1 s of GC — the shrinking residual
  * is driver-code JIT, which the bench's 161×4 invocations amortize).
  * Per-query output: median wall over the timed passes, plus n_jobs /
  * in-job / gap split and per-job callsites for the LAST pass. */
object R18Profile {

  private final class JobSpans extends SparkListener {
    final case class Span(id: Int, t0: Long, var t1: Long, desc: String)
    val spans = new java.util.concurrent.ConcurrentHashMap[Int, Span]()
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      val p = Option(js.properties)
      val d = p.flatMap(x => Option(x.getProperty("spark.job.description")))
        .orElse(p.flatMap(x => Option(x.getProperty("callSite.short"))))
        .orElse(js.stageInfos.lastOption.map(_.name))
        .getOrElse("")
      val stages = js.stageInfos.size
      spans.put(js.jobId,
        Span(js.jobId, System.nanoTime(), -1L, s"stages=$stages $d")); ()
    }
    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      Option(spans.get(je.jobId)).foreach(_.t1 = System.nanoTime()); ()
    }
    def reset(): Unit = spans.clear()
    def snapshot(): Seq[Span] = {
      import scala.jdk.CollectionConverters._
      spans.values.asScala.toSeq.sortBy(_.t0)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_R18_PASSES", "3").toInt
    val jobDetail = sys.env.getOrElse("SPARK_GRAFT_R18_JOBS", "0") == "1"
    val names: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else Seq("q_dedup_embedding_delta_capped", "q_dedup_embedding_delta",
        "q_stream_dedup_clusters_embedding", "q_stream_dedup_embedding",
        "q_stream_dedup_clusters_winnow", "q_stream_dedup_clusters",
        "q_stream_dedup_minhash", "q_dedup_minhash_delta_capped",
        "q_dedup_ngram_prefix", "q_dedup_keep")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new JobSpans
    spark.sparkContext.addSparkListener(listener)

    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // warmup: two passes — the second finishes what the first's cold
    // Catalyst left uncompiled (a single warmup still measured 2-3x gap
    // inflation on the first timed pass)
    (1 to 2).foreach { _ =>
      names.foreach { name =>
        try force(name) catch { case e: Throwable =>
          System.err.println(s"[r18p] warmup $name failed: ${e.getMessage}") }
      }
    }
    // Bench's per-pass cache hygiene: every invocation leaves its RESULT
    // cache persisted; without the release, 5 passes x N queries of leaked
    // relations are pure memory/GC pressure (the walls measured ~2.4x the
    // bench's before this landed)
    val memoRdds = spark.sparkContext.getPersistentRDDs.keySet
    def dropPassGarbage(): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!memoRdds.contains(id)) rdd.unpersist(blocking = false)
      }
    dropPassGarbage()
    ScaleBench.cpuRefMopsAll(cpus.toInt, 30000000L) // JIT-warm the kernel

    val walls = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to passes).foreach { pass =>
      val single = ScaleBench.cpuRefMops(60000000L)
      val all = ScaleBench.cpuRefMopsAll(cpus.toInt, 30000000L)
      println(f"[r18p] pass=$pass anchor1=$single%6.1f anchorN=$all%8.1f")
      names.foreach { name =>
        listener.reset()
        val t0 = System.nanoTime()
        try force(name) catch { case e: Throwable =>
          System.err.println(s"[r18p] $name failed: ${e.getMessage}") }
        val wall = (System.nanoTime() - t0) / 1e9
        walls(name) = wall :: walls(name)
        if (pass == passes) {
          Thread.sleep(300) // listener delivery is async
          val spans = listener.snapshot().filter(_.t1 > 0)
          val merged = spans.map(s => (s.t0, s.t1)).sortBy(_._1)
            .foldLeft(List.empty[(Long, Long)]) {
              case (Nil, iv) => iv :: Nil
              case ((a, b) :: rest, (c, d)) =>
                if (c <= b) (a, math.max(b, d)) :: rest else (c, d) :: (a, b) :: rest
            }
          val inJob = merged.map(iv => iv._2 - iv._1).sum / 1e9
          val med = walls(name).sorted.apply(walls(name).size / 2)
          println(f"[r18p] $name%-38s median=$med%7.3f last=$wall%7.3f " +
            f"n_jobs=${spans.size}%3d in_job=$inJob%7.3f gap=${wall - inJob}%7.3f")
          if (jobDetail) {
            var prevEnd = t0
            spans.foreach { s =>
              val d = (s.t1 - s.t0) / 1e6
              val gapBefore = (s.t0 - prevEnd) / 1e6
              prevEnd = math.max(prevEnd, s.t1)
              println(f"[r18p]   job=${s.id}%4d ${d}%8.1f ms (gap ${gapBefore}%8.1f) ${s.desc.take(100)}")
            }
          }
        }
      }
      dropPassGarbage()
    }
    spark.stop()
  }
}
