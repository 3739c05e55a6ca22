package graft

/** Standalone host-speed anchor probe (VERDICT r16 task #1): prints N
  * rounds of the single-thread and all-cores delivered-CPU anchors
  * ([[ScaleBench.cpuRefMops]] / [[ScaleBench.cpuRefMopsAll]]) as one JSON
  * line per round. Used to (a) stamp the committed canonical-window
  * baselines the bench normalizes against, and (b) spot-check a window's
  * health before/after an attribution cell without paying a full bench. */
object AnchorProbe {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(3)
    val nPer = sys.env.getOrElse("ANCHOR_N", "150000000").toLong
    val threads = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    (1 to rounds).foreach { r =>
      val s = ScaleBench.cpuRefMops()
      val a = ScaleBench.cpuRefMopsAll(threads, nPer)
      println(s"""{"round":$r,"threads":$threads,"single_mops":${num(s)},"all_mops":${num(a)},"per_core_mops":${num(a / threads)}}""")
    }
  }
}
