package graft.ml

/** The ONE model-client surface every inference seam in the engine routes
  * through — the Spark-side mirror of the reference's ML client accessor
  * (`ml/MLCommonsClientAccessor.java:110-546`), which is the single class a
  * real model connection lands in there too:
  *
  *   - [[ModelClient.embedDense]]        ← inferenceSentences (dense text)
  *   - [[ModelClient.encodeSparse]]      ← inferenceSentencesWithMapResult
  *   - [[ModelClient.embedMultimodal]]   ← inferenceSentencesMap (text+image)
  *   - [[ModelClient.similarity]]        ← inferenceSimilarity (cross-encoder)
  *   - [[ModelClient.spanScore]]         ← QUESTION_ANSWERING highlight head
  *     (highlight/single/SemanticHighlighterEngine.java:87-158)
  *
  * Implementations must be pure, deterministic functions of their inputs
  * (the oracle protocol) and Serializable (closures capture the
  * [[ModelRegistry]] module statically, so executors resolve their OWN
  * registry at call time — in a real deployment each executor installs the
  * model client at startup; in tests [[ModelRegistry.withClient]] swaps a
  * fake through every call site at once). */
trait ModelClient extends Serializable {
  def embedDense(text: String, dim: Int): Array[Float]
  def encodeSparse(text: String): Map[String, Float]
  def embedMultimodal(text: String, imageB64: String, dim: Int): Array[Float]
  def similarity(query: String, passage: String,
      dim: Int = HashEmbedder.DefaultDim): Float
  def spanScore(query: String, window: String,
      dim: Int = HashEmbedder.DefaultDim): Double
}

/** Default no-egress stand-in: the deterministic hash-embedder kernels.
  * spanScore = similarity of the window substring (a real QA head scores a
  * window as startLogit(first token) + endLogit(last token)). */
object HashModelClient extends ModelClient {
  def embedDense(text: String, dim: Int): Array[Float] =
    HashEmbedder.embed(text, dim)
  def encodeSparse(text: String): Map[String, Float] =
    HashEmbedder.encode(text)
  def embedMultimodal(text: String, imageB64: String, dim: Int): Array[Float] =
    HashEmbedder.embedMultimodal(text, imageB64, dim)
  def similarity(query: String, passage: String, dim: Int): Float =
    HashEmbedder.similarity(query, passage, dim)
  def spanScore(query: String, window: String, dim: Int): Double =
    HashEmbedder.similarity(query, window, dim).toDouble
}

/** Process-global model-client slot. Reads resolve at CALL time (not plan
  * time): a UDF planned before a swap still evaluates against the client
  * installed when the task runs — which is what lets one `withClient` wrap
  * an entire query execution, and what the per-executor install relies on
  * in cluster mode.
  *
  * Cluster-mode install is ONE --conf: the first `current` read in each
  * JVM (driver or executor) consults `spark.graft.modelClient` via
  * SparkEnv — the value names a [[ModelClient]] Scala object or
  * no-arg-constructor class on the executor classpath — and installs it
  * before any inference runs. An explicit [[install]]/[[withClient]] wins
  * over the conf (it latches resolution), so tests and driver-side
  * overrides behave the same with or without the conf set. */
object ModelRegistry {
  /** Conf key: fully-qualified [[ModelClient]] object/class name. */
  val ClientConfKey = "spark.graft.modelClient"

  @volatile private var cur: ModelClient = HashModelClient
  @volatile private var confResolved = false
  private val swapDepth = new java.util.concurrent.atomic.AtomicInteger(0)

  def current: ModelClient = {
    if (!confResolved) resolveFromConf()
    cur
  }

  def install(c: ModelClient): Unit = { confResolved = true; cur = c }

  /** Swap the client for the duration of `f` (tests / scoped inference);
    * restores the previous client even on failure. Local-mode scoped — on
    * a real cluster, use the conf install instead.
    *
    * The slot is process-GLOBAL, so `f` must FORCE evaluation of anything
    * that should see `c` (collect/count/write) — a DataFrame merely
    * planned inside and executed after the restore evaluates doc-side
    * UDFs against the restored client (while plan-time literals such as
    * an embedded query vector keep `c`'s values: a silent mixed-client
    * scoring inconsistency). Nested or concurrent swaps in one JVM have
    * the same cross-contamination hazard, so they fail loud here. */
  def withClient[T](c: ModelClient)(f: => T): T = {
    if (!confResolved) resolveFromConf()
    if (swapDepth.incrementAndGet() != 1) {
      swapDepth.decrementAndGet()
      throw new IllegalStateException(
        "ModelRegistry.withClient: nested or concurrent swap detected — the " +
          "client slot is process-global, so overlapping swaps silently mix " +
          "clients across queries; serialize the calls or use install()")
    }
    val prev = cur
    cur = c
    try f finally { cur = prev; swapDepth.decrementAndGet(); () }
  }

  /** One-shot lazy conf install: no-op until a SparkEnv exists in this JVM
    * (resolution stays un-latched before Spark init so an early read does
    * not permanently shadow the conf). Synchronized — executor task
    * threads race the first read. */
  private def resolveFromConf(): Unit = synchronized {
    if (confResolved) return
    val env = org.apache.spark.SparkEnv.get
    if (env != null) {
      clientFromConf(env.conf).foreach { c => cur = c }
      confResolved = true
    }
  }

  /** Instantiate the conf-named client: a Scala `object` (by its plain or
    * `$`-suffixed name) or a class with a no-arg constructor. Fails loud —
    * a cluster that asked for a real model must not silently score with
    * the hash stand-in. */
  private[graft] def clientFromConf(conf: org.apache.spark.SparkConf): Option[ModelClient] =
    conf.getOption(ClientConfKey).map { name =>
      val loader = Option(Thread.currentThread().getContextClassLoader)
        .getOrElse(getClass.getClassLoader)
      // Scala-object form first (a plain object name also loads as its
      // companion CLASS, which has no public no-arg constructor), then the
      // no-arg-constructor class form.
      val inst =
        try {
          val mod = Class.forName(
            if (name.endsWith("$")) name else name + "$", true, loader)
          mod.getField("MODULE$").get(null)
        } catch {
          case _: ClassNotFoundException | _: NoSuchFieldException =>
            Class.forName(name, true, loader).getDeclaredConstructor().newInstance()
        }
      inst match {
        case c: ModelClient => c
        case other => throw new IllegalArgumentException(
          s"$ClientConfKey=$name is not a graft.ml.ModelClient: ${other.getClass}")
      }
    }
}
