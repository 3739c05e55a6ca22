package graft.ml

/** Deterministic, egress-free "model" surface mirroring the reference's
  * `MLCommonsClientAccessor` (reference: ml/MLCommonsClientAccessor.java:110-546):
  *   - `embed`    ≈ inferenceSentences        (text → dense vector)
  *   - `encode`   ≈ inferenceSentencesWithMapResult (text → sparse token weights)
  *   - `embedMultimodal` ≈ inferenceSentencesMap ({inputText,inputImage} → dense)
  *   - `similarity` ≈ inferenceSimilarity     (cross-encoder stand-in)
  *
  * Semantics per FIXTURES.md §2: embed = hashed bag-of-words, L2-normalized;
  * encode = token -> 1 + ln(1 + count). Pure functions of the input string, so
  * unit tests and the DuckDB oracle can recompute them independently.
  */
object HashEmbedder extends Serializable {

  val DefaultDim = 8

  def tokenize(s: String): Array[String] =
    if (s == null) Array.empty
    else s.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** Stable token hash (do NOT use String.hashCode semantics implicitly —
    * we pin the algorithm so results never shift across JVMs). FNV-1a 32-bit. */
  def tokenHash(t: String): Int = {
    var h = 0x811c9dc5
    var i = 0
    while (i < t.length) { h ^= t.charAt(i); h *= 0x01000193; i += 1 }
    h
  }

  /** text → dense vector: v(hash(t) mod dim) += 1 per token, then L2-normalize. */
  def embed(s: String, dim: Int = DefaultDim): Array[Float] = {
    val v = new Array[Float](dim)
    tokenize(s).foreach { t =>
      val idx = math.floorMod(tokenHash(t), dim)
      v(idx) += 1f
    }
    l2normalize(v)
  }

  def l2normalize(v: Array[Float]): Array[Float] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n > 0) { i = 0; while (i < v.length) { v(i) = (v(i) / n).toFloat; i += 1 } }
    v
  }

  /** text → sparse token-weight map: token -> 1 + ln(1 + count).
    * Computed as `(1.0 + log(1.0 + c)).toFloat` so the DuckDB oracle can
    * reproduce it bit-for-bit with `CAST(1 + ln(1 + c) AS REAL)`. */
  def encode(s: String): Map[String, Float] =
    tokenize(s).groupBy(identity).map { case (t, g) =>
      t -> (1.0 + math.log(1.0 + g.length.toDouble)).toFloat
    }

  /** multimodal {text, image(base64)} → one dense vector (reference:
    * processor/TextImageEmbeddingProcessor.java — single inference per pair). */
  def embedMultimodal(text: String, imageB64: String, dim: Int = DefaultDim): Array[Float] = {
    val v = new Array[Float](dim)
    tokenize(text).foreach { t => v(math.floorMod(tokenHash(t), dim)) += 1f }
    if (imageB64 != null && imageB64.nonEmpty)
      v(math.floorMod(tokenHash("img:" + imageB64), dim)) += 1f
    l2normalize(v)
  }

  /** "cross-encoder" similarity = cosine(embed(q), embed(d)). */
  def similarity(q: String, d: String, dim: Int = DefaultDim): Float = {
    val a = embed(q, dim); val b = embed(d, dim)
    var s = 0.0; var i = 0
    while (i < dim) { s += a(i).toDouble * b(i); i += 1 }
    s.toFloat
  }
}
