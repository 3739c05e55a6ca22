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

/** Standard `SparkSessionExtensions` integration: the library's native
  * expressions become builtin-like functions in EVERY session of a cluster
  * configured with
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`),
  * instead of requiring a per-session `Graft.registerFunctions` call —
  * the same registration route any Spark extension library uses. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    def fn(name: String, usage: String)(build: Seq[Expression] => Expression) =
      (new FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.VectorExpressions", null, name, usage, ""),
        build)
    ext.injectFunction(fn("dense_dot",
      "dense_dot(array<float>, array<float>) - dot product")(
      e => VectorExpressions.DenseDot(e(0), e(1))))
    ext.injectFunction(fn("dense_cosine",
      "dense_cosine(array<float>, array<float>) - cosine similarity (0.0 on zero norm)")(
      e => VectorExpressions.DenseCosine(e(0), e(1))))
    ext.injectFunction(fn("sparse_dot",
      "sparse_dot(map<string,float>, map<string,float>) - token-weight dot product")(
      e => VectorExpressions.SparseDot(e(0), e(1))))
  }
}
