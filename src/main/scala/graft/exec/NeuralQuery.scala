package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions
import graft.ingest.Enrich
import graft.ml.HashEmbedder

/** The `neural` query (dense k-NN driven by text→vector inference) —
  * reference query/NeuralQueryBuilder.java:125-1325. The query text is
  * embedded ONCE at plan time (the reference's coordinator-side inference
  * hoisting, L905-931) and becomes a literal, so Catalyst constant-folds it
  * into the scan-side scoring expression.
  *
  * Covers:
  *   - top-k by cosine (k-NN; DEFAULT_K 10)
  *   - radial: min_score / max_distance filters (L127-175)
  *   - pre-filter pushed below scoring (the `filter` param, plain
  *     Catalyst predicate pushdown)
  *   - chunked/nested semantic targets with ScoreMode.Max semantics
  *     (expand_nested; L786-787, 828-829): posexplode chunks → max per doc.
  */
object NeuralQuery {

  /** Score a corpus text column against query text: embed both sides with
    * the deterministic model, cosine. `vecCol` scores a precomputed
    * embedding column instead (no doc-side inference). */
  def scoreByText(corpus: DataFrame, queryText: String, textCol: String,
      dim: Int = HashEmbedder.DefaultDim): DataFrame = {
    val qv = graft.ml.ModelRegistry.current.embedDense(queryText, dim)
    corpus.withColumn("score",
      round(VectorExpressions.dense_cosine(Enrich.embedUdf(dim)(col(textCol)), typedLit(qv)), 6))
  }

  /** Asymmetric-model scoring: the query text embeds with QUERY content type
    * (NeuralQueryBuilder.java:923,1162 always pass EmbeddingContentType.QUERY)
    * against a corpus embedding column produced at ingest with PASSAGE
    * content (Enrich.textEmbedding(model=…)). For a symmetric config this
    * degenerates to scoreByVector(embed(queryText)). */
  def scoreByTextAsymmetric(corpus: DataFrame, queryText: String, vecCol: String,
      model: graft.ml.AsymmetricModel.ModelConfig,
      dim: Int = HashEmbedder.DefaultDim): DataFrame = {
    val qv = graft.ml.AsymmetricModel.embed(
      queryText, graft.ml.AsymmetricModel.ContentType.Query, model, dim)
    scoreByVector(corpus, qv, vecCol)
  }

  def scoreByVector(corpus: DataFrame, queryVec: Array[Float], vecCol: String): DataFrame =
    corpus.withColumn("score",
      round(VectorExpressions.dense_cosine(col(vecCol), typedLit(queryVec)), 6))

  def topK(scored: DataFrame, k: Int, docId: String = "doc_id"): DataFrame =
    scored.orderBy(col("score").desc, col(docId).asc).limit(k)

  /** Scalar byte quantization of an L2-normalized dense embedding column:
    * code = trunc(v * 127) per component (components ∈ [−1,1] after L2
    * normalization, so codes fit a signed byte). The ingest-side artifact
    * for the `rescore` query path — the dense analogue of the SEISMIC byte
    * quantizer (sparse/quantization/ByteQuantizationUtil.java), and of the
    * k-NN quantized index the reference's RescoreContext exists to
    * compensate for. trunc (not round) so the arithmetic is identical in
    * the DuckDB oracle. */
  def quantizeDense(corpus: DataFrame, vecCol: String, qCol: String): DataFrame =
    corpus.withColumn(qCol,
      transform(col(vecCol), x => (x.cast("double") * lit(127.0)).cast("int").cast("byte")))

  /** `rescore: {oversample_factor}` (NeuralKNNQueryBuilder.java:147-256,
    * RescoreParser surface): first pass scores the QUANTIZED vectors and
    * keeps ceil(k × oversample) candidates; the rescore pass recomputes
    * exact cosine on the full-precision vectors for just those candidates
    * and returns the top k. At scale the first pass is the cheap scan
    * (byte codes: 4× smaller than float32, wholly columnar) and the exact
    * pass touches only k×oversample rows — the reference's
    * quantized-index + rescore cost shape, re-expressed as a 2-stage plan. */
  def topKWithRescore(corpus: DataFrame, queryVec: Array[Float],
      vecCol: String, qCol: String, k: Int, oversample: Double = 2.0,
      docId: String = "doc_id"): DataFrame = {
    val shortlistK = math.ceil(k * oversample).toInt
    // dequantize to FLOAT (the Expression's input type) — the float cast is
    // part of the cross-engine protocol, mirrored by the oracle's
    // CAST(c/127.0 AS REAL)
    val deq = transform(col(qCol), c => (c.cast("double") / lit(127.0)).cast("float"))
    val approx = corpus
      .withColumn("approx_score",
        round(VectorExpressions.dense_cosine(deq, typedLit(queryVec)), 6))
      .orderBy(col("approx_score").desc, col(docId).asc)
      .limit(shortlistK)
    approx
      .withColumn("score",
        round(VectorExpressions.dense_cosine(col(vecCol), typedLit(queryVec)), 6))
      .select(col(docId), col("score"))
      .orderBy(col("score").desc, col(docId).asc)
      .limit(k)
  }

  /** Radial search: keep docs with score ≥ minScore (cosine form of the
    * reference's min_score; max_distance is the metric-space dual). */
  def radial(scored: DataFrame, minScore: Double): DataFrame =
    scored.where(col("score") >= minScore)

  /** Radial search, distance form — the reference accepts EITHER min_score
    * or max_distance (NeuralQueryBuilder.java:127-175; both set is an
    * error, L166-170). For the cosine space the distance is d = 1 − cos, so
    * keep docs with d ≤ maxDistance ⇔ score ≥ 1 − maxDistance. The cut is
    * applied to the distance column so the emitted relation carries the
    * metric the caller asked in. */
  def radialMaxDistance(scored: DataFrame, maxDistance: Double): DataFrame =
    scored
      .withColumn("distance", round(lit(1.0) - col("score"), 6))
      .where(col("distance") <= maxDistance)

  /** Nested/chunked semantic scoring with ScoreMode.Max: score every chunk,
    * keep the max per document (reference wraps the knn query in a nested
    * query with ScoreMode.Max). `chunksCol`: Array[Struct(text, embedding)]
    * as produced by Enrich.semanticField. */
  def chunkedMaxScore(corpus: DataFrame, queryText: String, chunksCol: String,
      docId: String = "doc_id", dim: Int = HashEmbedder.DefaultDim): DataFrame = {
    val qv = graft.ml.ModelRegistry.current.embedDense(queryText, dim)
    corpus
      .select(col(docId), posexplode(col(chunksCol)).as(Seq("chunk_idx", "chunk")))
      .select(col(docId), col("chunk_idx"),
        VectorExpressions.dense_cosine(col("chunk.embedding"), typedLit(qv)).as("chunk_score"))
      .groupBy(col(docId))
      .agg(round(max(col("chunk_score")), 6).as("score"))
  }
}
