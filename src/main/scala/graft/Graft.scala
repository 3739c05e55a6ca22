package graft

import org.apache.spark.sql.SparkSession

import graft.functions.VectorExpressions

/** Library entry point: session defaults + SQL function registration.
  *
  * {{{
  * val spark = Graft.session()                  // tuned local session
  * Graft.registerFunctions(spark)               // dense_dot/cosine, sparse_dot in SQL
  * spark.sql("SELECT dense_cosine(a.embedding, b.embedding) FROM ...")
  * }}}
  */
object Graft {

  /** Recommended local session; on a cluster pass master/conf externally
    * and only `registerFunctions` is needed. */
  def session(master: String = "local[*]", shufflePartitions: Int =
      Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    registerFunctions(s)
    s
  }

  /** Expose the native Catalyst expressions to SQL. */
  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dense_dot",
      exprs => VectorExpressions.DenseDot(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dense_cosine",
      exprs => VectorExpressions.DenseCosine(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("sparse_dot",
      exprs => VectorExpressions.SparseDot(exprs(0), exprs(1)), "scala_udf")
  }
}
