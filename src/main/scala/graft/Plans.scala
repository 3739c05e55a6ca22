package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans of selected queries so the
  * scale hygiene (PushedFilters, broadcast joins, WholeStageCodegen spans)
  * can be inspected per round. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
    else Seq("q_filter_agg", "q_join_agg", "q_sparse_postings", "q_hybrid_minmax_arith", "q_ann_cosine")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
