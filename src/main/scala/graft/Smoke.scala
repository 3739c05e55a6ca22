package graft

import org.apache.spark.sql.SparkSession

/** Local smoke driver: runs the flagship `SparkEntry.entry` the same way the
  * round driver does (rows>0 check) and prints the result. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[smoke] entry rows=${rows.length}")
    rows.foreach(r => println(s"[smoke] $r"))
    require(rows.nonEmpty, "entry returned no rows")
    spark.stop()
  }
}
