package graft

import org.apache.spark.sql.functions._

import graft.exec.NeuralQuery
import graft.ingest.Enrich
import graft.ml.HashEmbedder

/** Neural `rescore` (quantized first pass + oversampled exact rescore) and
  * the multimodal skip_existing filter. */
class RescoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = (1L to 40L).map { i =>
    (i, HashEmbedder.embed(s"doc number $i with words ${"x " * (i % 7).toInt}", 16))
  }.toDF("vec_id", "embedding")

  test("oversample covering the corpus reproduces exact brute-force top-k") {
    val quant = NeuralQuery.quantizeDense(corpus, "embedding", "emb_q")
    val qv = HashEmbedder.embed("doc number query words", 16)
    val exact = graft.ann.Ann.bruteForceTopK(
      corpus.withColumnRenamed("vec_id", "vec_id"), qv, k = 10)
      .select("vec_id").as[Long].collect().toSeq
    val rescored = NeuralQuery.topKWithRescore(
      quant, qv, "embedding", "emb_q", k = 10, oversample = 4.0, docId = "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    assert(rescored == exact)
  }

  test("quantized codes stay within a signed byte for L2-normalized vectors") {
    val quant = NeuralQuery.quantizeDense(corpus, "embedding", "emb_q")
    val bounds = quant.select(array_max(col("emb_q")).as("mx"), array_min(col("emb_q")).as("mn"))
      .agg(max(col("mx")), min(col("mn"))).head()
    assert(bounds.getByte(0) <= 127 && bounds.getByte(1) >= -127)
  }

  test("GraftExtensions registers the vector functions on a new session") {
    val orig = TestSpark.spark
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    try {
      // same SparkContext, fresh session → extensions apply at construction
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val c = s2.sql(
        """SELECT dense_cosine(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
          |                    CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c""".stripMargin)
        .head().getDouble(0)
      assert(math.abs(c - 1.0) < 1e-9)
      val d = s2.sql(
        """SELECT sparse_dot(map('a', CAST(2.0 AS FLOAT)),
          |                  map('a', CAST(3.0 AS FLOAT))) AS d""".stripMargin)
        .head().getDouble(0)
      assert(math.abs(d - 6.0) < 1e-9)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(orig)
      org.apache.spark.sql.SparkSession.setActiveSession(orig)
    }
  }

  test("multimodal skip_existing re-infers when EITHER input changed") {
    val prev = Seq(
      (1L, "same text", "imgA", Array(9f, 9f)), // unchanged pair → reuse
      (2L, "same text", "imgA", Array(8f, 8f)), // image changes → re-infer
      (3L, "old text", "imgA", Array(7f, 7f))   // text changes → re-infer
    ).toDF("doc_id", "text", "img", "emb")
    val cur = Seq(
      (1L, "same text", "imgA"),
      (2L, "same text", "imgB"),
      (3L, "new text", "imgA"),
      (4L, "brand new", "imgC") // absent from snapshot → infer
    ).toDF("doc_id", "text", "img")
    val out = Enrich.embedMultimodalWithSkipExisting(cur, prev, "doc_id", "text", "img", "emb", dim = 2)
      .select(col("doc_id"), col("emb")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(out(1L).sameElements(Array(9f, 9f))) // reused snapshot embedding
    assert(out(2L).sameElements(HashEmbedder.embedMultimodal("same text", "imgB", 2)))
    assert(out(3L).sameElements(HashEmbedder.embedMultimodal("new text", "imgA", 2)))
    assert(out(4L).sameElements(HashEmbedder.embedMultimodal("brand new", "imgC", 2)))
  }
}
