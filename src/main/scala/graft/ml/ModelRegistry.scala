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
  * an entire query execution, and what a per-executor startup install
  * relies on in cluster mode. */
object ModelRegistry {
  @volatile private var cur: ModelClient = HashModelClient
  def current: ModelClient = cur
  def install(c: ModelClient): Unit = { cur = c }
  /** Swap the client for the duration of `f` (tests / scoped inference);
    * restores the previous client even on failure. Local-mode scoped — on a
    * real cluster, install() at executor startup instead. */
  def withClient[T](c: ModelClient)(f: => T): T = {
    val prev = cur
    cur = c
    try f finally cur = prev
  }
}
