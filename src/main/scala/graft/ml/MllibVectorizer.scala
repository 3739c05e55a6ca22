package graft.ml

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, HashingTF, IDF, IDFModel, MinHashLSH, Normalizer, RegexTokenizer}
import org.apache.spark.ml.linalg.{SparseVector => MlSparseVector, Vector => MlVector, Vectors}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MLlib-backed vectorization + similarity engines (BASELINE.json approach:
  * "MLlib for vectorization + bulk indexing"). These sit beside the
  * deterministic HashEmbedder as production-shaped alternatives:
  *
  *   - tf-idf document vectors: RegexTokenizer → HashingTF → IDF →
  *     Normalizer — the classic MLlib estimator/transformer pipeline; the
  *     fitted IDFModel is the "model artifact" of bulk indexing.
  *   - MinHashLSH: MLlib's estimator over binarized term vectors —
  *     `approxSimilarityJoin` is the library's native near-dup engine.
  *   - BucketedRandomProjectionLSH over dense embeddings — MLlib's ANN for
  *     Euclidean space (on L2-normalized vectors, distance ranks are
  *     equivalent to cosine ranks: ||a−b||² = 2 − 2·cos).
  *
  * Everything here is DataFrame-native and cluster-scalable: fit() runs
  * one aggregation job; transform() is a projection.
  */
object MllibVectorizer {

  val DefaultNumFeatures = 1 << 18

  case class TfIdf(hashingTF: HashingTF, idfModel: IDFModel) {
    /** corpus/text → L2-normalized tf-idf vector column `features`. */
    def transform(df: DataFrame, textCol: String = "text"): DataFrame = {
      val tok = new RegexTokenizer().setInputCol(textCol).setOutputCol("__words")
        .setPattern("\\s+").setToLowercase(true)
      val tf = hashingTF.transform(tok.transform(df))
      val idf = idfModel.transform(tf)
      val norm = new Normalizer().setInputCol("__rawFeatures_idf").setOutputCol("features").setP(2.0)
      norm.transform(idf).drop("__words", "__rawFeatures", "__rawFeatures_idf")
    }
  }

  /** Fit the tf-idf "index build": one pass for document frequencies. */
  def fitTfIdf(corpus: DataFrame, textCol: String = "text",
      numFeatures: Int = DefaultNumFeatures): TfIdf = {
    val tok = new RegexTokenizer().setInputCol(textCol).setOutputCol("__words")
      .setPattern("\\s+").setToLowercase(true)
    val hashingTF = new HashingTF().setInputCol("__words").setOutputCol("__rawFeatures")
      .setNumFeatures(numFeatures)
    val tf = hashingTF.transform(tok.transform(corpus))
    val idf = new IDF().setInputCol("__rawFeatures").setOutputCol("__rawFeatures_idf").fit(tf)
    TfIdf(hashingTF, idf)
  }

  /** Cosine top-k of a query string against tf-idf document vectors
    * (both sides L2-normalized ⇒ dot product = cosine). */
  def tfIdfTopK(model: TfIdf, corpus: DataFrame, queryText: String, k: Int,
      textCol: String = "text", docId: String = "doc_id"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val docs = model.transform(corpus, textCol)
    val qv = model.transform(Seq(queryText).toDF(textCol), textCol)
      .select(col("features")).head().getAs[MlVector](0)
    val qvB = spark.sparkContext.broadcast(qv)
    val dot = udf((v: MlVector) => {
      val q = qvB.value
      var s = 0.0
      v match {
        case sv: MlSparseVector =>
          var i = 0
          while (i < sv.indices.length) { s += sv.values(i) * q(sv.indices(i)); i += 1 }
        case dv =>
          var i = 0
          while (i < dv.size) { s += dv(i) * q(i); i += 1 }
      }
      s
    })
    docs.select(col(docId).as("doc_id"), round(dot(col("features")), 6).as("score"))
      .where(col("score") > 0.0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  // ------------------------------------------------------ exact rescoring
  //
  // MLlib's internals (murmur3 feature hashing, minhash families, BRP
  // projections) are opaque to a cross-engine oracle. Each engine therefore
  // uses the MLlib stage for CANDIDATE GENERATION only and rescores the
  // candidates with its own term-space expressions — the classic two-stage
  // cascade (identical in shape to the reference's rerank pipeline). The
  // emitted relation is exact as long as the candidate set covers the true
  // top-k / pair set, which the generous candidate margins guarantee at the
  // tested scales (and which the invariant specs check).

  /** Exact term-space tf-idf cosine per document (the engine-owned rescoring
    * formula; MLlib-compatible: tf = raw count, idf = ln((m+1)/(df+1)) —
    * IDF.scala's formula — and L2 norms on both sides, but computed over
    * TERMS, not hashed buckets, so it is hash-collision-free and
    * SQL-expressible). Returns (doc_id, score round-6) for score > 0. */
  def tfIdfExactScores(corpus: DataFrame, queryText: String,
      textCol: String = "text", docId: String = "doc_id"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val m = corpus.count()
    val tf = corpus
      .select(col(docId).as("doc_id"),
        explode(split(lower(col(textCol)), "\\s+")).as("t"))
      .where(col("t") =!= "")
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val tfidf = tf.join(dfreq, "t")
      .withColumn("w", col("tf") * log((lit(m) + 1.0) / (col("df") + 1.0)))
    val docNorm = tfidf.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("dnorm"))
    // query terms: counts from the same tokenizer; unseen terms keep
    // df = 0 (idf = ln(m+1)) — they cannot match any doc but DO contribute
    // to the query norm, exactly as the fitted MLlib model's query vector
    val qCounts = HashEmbedder.tokenize(queryText)
      .groupBy(identity).map { case (t, ts) => (t, ts.length.toDouble) }.toSeq
    val qDf = broadcast(qCounts.toDF("t", "qtf"))
    val qW = qDf.join(dfreq, Seq("t"), "left")
      .withColumn("qw", col("qtf") * log((lit(m) + 1.0) / (coalesce(col("df"), lit(0L)) + 1.0)))
    val qNorm = qW.agg(sqrt(sum(col("qw") * col("qw"))).as("qnorm"))
    tfidf
      .join(broadcast(qW.select(col("t"), col("qw"))), "t")
      .groupBy(col("doc_id"))
      .agg(sum(col("w") * col("qw")).as("dot"))
      .join(docNorm, "doc_id")
      .crossJoin(broadcast(qNorm))
      .select(col("doc_id"),
        round(col("dot") / (col("dnorm") * col("qnorm")), 6).as("score"))
      .where(col("score") > 0.0)
  }

  /** Two-stage tf-idf top-k: MLlib candidates (hashed-space pipeline),
    * engine exact rescore, final top-k. */
  def tfIdfTopKRescored(corpus: DataFrame, queryText: String, k: Int,
      candidateFactor: Int = 5, textCol: String = "text",
      docId: String = "doc_id"): DataFrame = {
    val model = fitTfIdf(corpus, textCol)
    val cands = tfIdfTopK(model, corpus, queryText, k * candidateFactor, textCol, docId)
      .select(col("doc_id"))
    tfIdfExactScores(corpus, queryText, textCol, docId)
      .join(cands, Seq("doc_id"), "left_semi")
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Two-stage near-dup pairs: MLlib MinHashLSH candidates at a LOOSE
    * distance cut, engine exact shingle-Jaccard verification at the real
    * threshold (candidateSlack keeps hashed-set≈string-set boundary pairs
    * from being dropped before verification). */
  def minhashNearDupRescored(corpus: DataFrame, threshold: Double = 0.5,
      candidateSlack: Double = 0.1, textCol: String = "text",
      docId: String = "doc_id", shingleSize: Int = 3): DataFrame = {
    val cands = minhashNearDup(corpus, textCol, docId, shingleSize,
      maxJaccardDistance = math.min(1.0, 1.0 - threshold + candidateSlack))
      .select(col("id_a"), col("id_b"))
    val shUdf = udf((s: String) => graft.dedup.Dedup.shingles(s, shingleSize).toSeq)
    val sh = corpus.select(col(docId).as("id"), shUdf(col(textCol)).as("sh"))
    val jacc = udf((a: Seq[String], b: Seq[String]) => {
      val sa = a.toSet; val sb = b.toSet
      val inter = sa.intersect(sb).size.toDouble
      val uni = sa.union(sb).size.toDouble
      if (uni == 0) 1.0 else inter / uni
    })
    cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("__raw", jacc(col("sh_a"), col("sh_b")))
      .where(col("__raw") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__raw"), 4).as("jaccard"))
  }

  /** Two-stage ANN: MLlib BRP-LSH approximate neighbors as candidates,
    * engine exact Euclidean rescore, final top-k by distance. */
  def annTopKRescored(corpus: DataFrame, query: Array[Float], k: Int,
      candidateFactor: Int = 5, vecCol: String = "embedding",
      idCol: String = "vec_id", bucketLength: Double = 2.0,
      numHashTables: Int = 3, seed: Long = 42L): DataFrame = {
    val cands = annTopK(corpus, query, k * candidateFactor, vecCol, idCol,
      bucketLength, numHashTables, seed).select(col("vec_id"))
    val q = query
    val distUdf = udf((v: Seq[Float]) => {
      var s = 0.0; var i = 0
      val n = math.min(v.length, q.length)
      while (i < n) { val d = v(i).toDouble - q(i).toDouble; s += d * d; i += 1 }
      math.sqrt(s)
    })
    corpus.select(col(idCol).as("vec_id"), round(distUdf(col(vecCol)), 6).as("dist"))
      .join(cands, Seq("vec_id"), "left_semi")
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(k)
  }

  /** MLlib MinHashLSH near-dup pairs on binarized word-shingle sets.
    * Shingles (not unigrams) keep the feature sets discriminative — with a
    * small vocabulary, unigram SETS of any two long documents are nearly
    * identical and the approx join degenerates to all-pairs. */
  def minhashNearDup(corpus: DataFrame, textCol: String = "text",
      docId: String = "doc_id", shingleSize: Int = 3,
      numFeatures: Int = DefaultNumFeatures,
      numHashTables: Int = 8, maxJaccardDistance: Double = 0.5,
      seed: Long = 42L): DataFrame = {
    val shinglesUdf = udf((s: String) =>
      graft.dedup.Dedup.shingles(s, shingleSize).toSeq)
    val tf = new HashingTF().setInputCol("__words").setOutputCol("__tf")
      .setNumFeatures(numFeatures).setBinary(true)
    // persist: consumed three times (fit + both sides of the self-join) —
    // without it the shingle UDF + HashingTF run per consumer
    val feats = tf.transform(
      corpus.withColumn("__words", shinglesUdf(col(textCol))))
      .select(col(docId).as("id"), col("__tf").as("features"))
      .where(udf((v: MlVector) => v.numNonzeros > 0).apply(col("features")))
      .persist()
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("__hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
    val lshModel = lsh.fit(feats)
    lshModel.approxSimilarityJoin(feats, feats, maxJaccardDistance, "jaccard_dist")
      .select(col("datasetA.id").as("id_a"), col("datasetB.id").as("id_b"),
        round(lit(1.0) - col("jaccard_dist"), 4).as("jaccard"))
      .where(col("id_a") < col("id_b"))
  }

  /** MLlib BucketedRandomProjectionLSH ANN over a dense embedding column.
    * Returns top-k by Euclidean distance (≡ cosine rank on unit vectors). */
  def annTopK(corpus: DataFrame, query: Array[Float], k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id",
      bucketLength: Double = 2.0, numHashTables: Int = 3,
      seed: Long = 42L): DataFrame = {
    val toMl = udf((v: Seq[Float]) => Vectors.dense(v.map(_.toDouble).toArray))
    val feats = corpus.select(col(idCol).as("vec_id"), toMl(col(vecCol)).as("features"))
    val lsh = new BucketedRandomProjectionLSH().setInputCol("features").setOutputCol("__hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(seed)
    val model = lsh.fit(feats)
    val qv = Vectors.dense(query.map(_.toDouble))
    model.approxNearestNeighbors(feats, qv, k, "dist").asInstanceOf[DataFrame]
      .select(col("vec_id"), round(col("dist"), 6).as("dist"))
  }
}
