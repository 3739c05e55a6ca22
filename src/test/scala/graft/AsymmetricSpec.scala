package graft

import org.apache.spark.sql.functions._

import graft.exec.NeuralQuery
import graft.ingest.Enrich
import graft.ml.{AsymmetricModel, HashEmbedder}
import graft.ml.AsymmetricModel.{ContentType, ModelConfig}

/** Asymmetric embedding models: detector, content-type prefixing, ingest
  * (PASSAGE) vs query (QUERY) dataflow, and skip_existing interaction.
  * Reference: ml/AsymmetricModelDetector.java, processor/EmbeddingContentType
  * .java, processor/TextEmbeddingProcessor.java:115,
  * query/NeuralQueryBuilder.java:923,1162. */
class AsymmetricSpec extends SparkSpec {
  import spark.implicits._

  private val asym = ModelConfig(Some("query: "), Some("passage: "))

  test("detector: prefixes or the remote flag make a model asymmetric") {
    assert(!AsymmetricModel.Symmetric.isAsymmetric)
    assert(ModelConfig(queryPrefix = Some("q: ")).isAsymmetric)
    assert(ModelConfig(passagePrefix = Some("p: ")).isAsymmetric)
    assert(ModelConfig(isAsymmetricFlag = true).isAsymmetric)
  }

  test("content type is a no-op for symmetric models, a prefix for asymmetric") {
    val t = "spark join"
    assert(AsymmetricModel.embed(t, ContentType.Query, AsymmetricModel.Symmetric)
      .sameElements(HashEmbedder.embed(t)))
    assert(AsymmetricModel.embed(t, ContentType.Query, asym)
      .sameElements(HashEmbedder.embed("query: " + t)))
    assert(AsymmetricModel.embed(t, ContentType.Passage, asym)
      .sameElements(HashEmbedder.embed("passage: " + t)))
    // one-sided config: the missing side embeds the raw text
    assert(AsymmetricModel.embed(t, ContentType.Passage, ModelConfig(queryPrefix = Some("q: ")))
      .sameElements(HashEmbedder.embed(t)))
  }

  test("ingest embeds PASSAGE; query path embeds QUERY; they differ") {
    val docs = Seq((1L, "spark join fast"), (2L, "window agg sort")).toDF("doc_id", "text")
    val enriched = Enrich.textEmbedding(docs, Map("text" -> "emb"), model = asym)
    val rows = enriched.select(col("doc_id"), col("emb")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(rows(1L).sameElements(HashEmbedder.embed("passage: spark join fast")))

    val scored = NeuralQuery.scoreByTextAsymmetric(enriched, "spark join fast", "emb", asym)
      .select(col("doc_id"), col("score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // asymmetric self-match is NOT cosine 1.0 — query and passage texts differ
    val expected = {
      val q = HashEmbedder.embed("query: spark join fast")
      val p = HashEmbedder.embed("passage: spark join fast")
      val dot = q.zip(p).map { case (a, b) => a.toDouble * b }.sum
      val na = math.sqrt(q.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(p.map(x => x.toDouble * x).sum)
      BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(math.abs(rows(1L).length - HashEmbedder.DefaultDim) == 0)
    assert(math.abs(scored(1L) - expected) < 1e-9)
  }

  test("symmetric config reproduces the plain textEmbedding dataflow") {
    val docs = Seq((1L, "spark join fast")).toDF("doc_id", "text")
    val plain = Enrich.textEmbedding(docs, Map("text" -> "emb"))
      .select("emb").head().getSeq[Float](0)
    val sym = Enrich.textEmbedding(docs, Map("text" -> "emb"), model = AsymmetricModel.Symmetric)
      .select("emb").head().getSeq[Float](0)
    assert(plain == sym)
  }
}
