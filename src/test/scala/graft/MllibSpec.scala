package graft

import org.apache.spark.sql.functions._
import graft.ml.{HashEmbedder, MllibVectorizer}

class MllibSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark join table join fast"),
    (2L, "slow scan big table"),
    (3L, "spark spark spark stream"),
    (4L, "completely unrelated words here"),
    (5L, "spark join table join fast") // exact dup of 1
  ).toDF("doc_id", "text")

  test("tf-idf topk ranks the exact-match docs first") {
    val model = MllibVectorizer.fitTfIdf(docs, numFeatures = 1 << 12)
    val out = MllibVectorizer.tfIdfTopK(model, docs, "spark join table join fast", 5).collect()
    // docs 1 and 5 are identical to the query → cosine 1.0, top two
    assert(out.take(2).map(_.getLong(0)).toSet == Set(1L, 5L))
    assert(math.abs(out(0).getDouble(1) - 1.0) < 1e-6)
    assert(!out.map(_.getLong(0)).take(3).contains(4L))
  }

  test("MLlib MinHashLSH finds the exact-dup pair") {
    val pairs = MllibVectorizer.minhashNearDup(docs, maxJaccardDistance = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.get((1L, 5L)).contains(1.0))
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("BucketedRandomProjectionLSH ANN returns k nearest by distance") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = HashEmbedder.embed("vector search engine query data", 64)
    val ann = MllibVectorizer.annTopK(emb, q, 10, numHashTables = 6, bucketLength = 5.0)
      .collect().map(_.getLong(0)).toSet
    // compare against exact: ANN with generous tables should overlap heavily
    val exact = graft.ann.Ann.bruteForceTopK(emb, q, 10).collect().map(_.getLong(0)).toSet
    // Euclidean vs cosine rank differ on non-normalized vectors; require overlap
    assert(ann.size == 10)
    assert((ann intersect exact).nonEmpty)
  }

  // ---- rescored-cascade coverage invariants -------------------------------
  // The driver-gate q_mllib_* queries are candidates-from-MLlib +
  // engine-exact-rescore; the oracle computes the exact relation directly,
  // so equality holds iff the MLlib candidate stage COVERS the exact
  // answer. These pin that coverage on the testdata the gate runs against.

  // both the smoke scale and the GATE scale (sf0.01 is what the driver's
  // DuckDB compare runs against — coverage must hold there, not just on
  // the smaller table)
  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"tfIdfTopKRescored equals the exact term-space top-k ($sf corpus)") {
      val corpus = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val rescored = MllibVectorizer.tfIdfTopKRescored(
        corpus, "spark join fast table scan", 10).collect()
      val exact = MllibVectorizer.tfIdfExactScores(corpus, "spark join fast table scan")
        .orderBy(col("score").desc, col("doc_id").asc).limit(10).collect()
      assert(rescored.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
        exact.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    }

    test(s"annTopKRescored equals the exact Euclidean top-k ($sf embeddings)") {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val q = SparkEntry.qDense64
      val rescored = MllibVectorizer.annTopKRescored(emb, q, 10,
        numHashTables = 6, bucketLength = 5.0).collect()
      val distUdf = udf((v: Seq[Float]) => {
        var s = 0.0; var i = 0
        while (i < math.min(v.length, q.length)) { val d = v(i).toDouble - q(i).toDouble; s += d * d; i += 1 }
        math.sqrt(s)
      })
      val exact = emb.select(col("vec_id"), round(distUdf(col("embedding")), 6).as("dist"))
        .orderBy(col("dist").asc, col("vec_id").asc).limit(10).collect()
      assert(rescored.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
        exact.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    }
  }

  test("minhashNearDupRescored equals exact pair relation at the gate scale (sf0.01)") {
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val rescored = MllibVectorizer.minhashNearDupRescored(corpus, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ngramJaccardPairs with the same shingle size and threshold IS the
    // exact all-pairs relation (only pairs with zero overlap are skipped,
    // and those cannot reach any positive threshold)
    val exact = graft.dedup.Dedup.ngramJaccardPairs(corpus, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rescored == exact)
  }

  test("indexed tf-idf rescored cascade equals the inline-build form (sf0.01)") {
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val idx = MllibVectorizer.buildTfIdfIndex(corpus)
    val q = "spark join fast table scan"
    val indexed = MllibVectorizer.tfIdfTopKRescored(corpus, q, 10, index = Some(idx)).collect()
    val inline = MllibVectorizer.tfIdfTopKRescored(corpus, q, 10).collect()
    assert(indexed.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      inline.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("driver-side queryVector equals the transform-path query vector") {
    val model = MllibVectorizer.fitTfIdf(docs, numFeatures = 1 << 12)
    import spark.implicits._
    val viaTransform = model.transform(Seq("Spark  JOIN fast table join").toDF("text"))
      .select(col("features")).head().getAs[org.apache.spark.ml.linalg.Vector](0)
    val viaDriver = model.queryVector("Spark  JOIN fast table join")
    assert(viaTransform.toArray.zip(viaDriver.toArray).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("indexed minhash rescored pairs equal the inline-build form (sf0.01)") {
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val idx = MllibVectorizer.buildMinhashIndex(corpus)
    val indexed = MllibVectorizer.minhashNearDupRescored(corpus, threshold = 0.5, index = Some(idx))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val inline = MllibVectorizer.minhashNearDupRescored(corpus, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(indexed == inline)
  }

  test("minhashNearDupRescored equals exact all-pairs Jaccard (small corpus)") {
    val rescored = MllibVectorizer.minhashNearDupRescored(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: every pair's exact shingle jaccard
    val sh = docs.collect().map(r =>
      r.getLong(0) -> graft.dedup.Dedup.shingles(r.getString(1), 3)).toMap
    val exact = (for {
      a <- sh.keys; b <- sh.keys if a < b
      j = sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size
      if j >= 0.5
    } yield (a, b)).toSet
    assert(rescored == exact)
  }
}
