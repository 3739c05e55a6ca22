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
