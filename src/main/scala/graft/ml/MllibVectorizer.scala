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

    /** Driver-side query vector — same tokenize → hash → idf → L2 path as
      * [[transform]] (HashingTF.indexOf + IDFModel.idf are the public
      * accessors to the identical murmur3 buckets and fitted weights), with
      * no 1-row Spark job per query. */
    def queryVector(text: String): MlVector = {
      val idf = idfModel.idf
      val counts = new scala.collection.mutable.HashMap[Int, Double]()
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { t =>
        val i = hashingTF.indexOf(t)
        counts(i) = counts.getOrElse(i, 0.0) + 1.0
      }
      val entries = counts.toArray.map { case (i, tfv) => (i, tfv * idf(i)) }.sortBy(_._1)
      val norm = math.sqrt(entries.map(e => e._2 * e._2).sum)
      Vectors.sparse(hashingTF.getNumFeatures, entries.map(_._1),
        entries.map(e => if (norm == 0.0) 0.0 else e._2 / norm))
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
    * (both sides L2-normalized ⇒ dot product = cosine). With
    * `preTransformed`, `corpus` is already a (docId, features) relation
    * (e.g. [[TfIdfIndex.features]]) and the document transform is skipped. */
  def tfIdfTopK(model: TfIdf, corpus: DataFrame, queryText: String, k: Int,
      textCol: String = "text", docId: String = "doc_id",
      preTransformed: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    val docs = if (preTransformed) corpus else model.transform(corpus, textCol)
    val qv = model.queryVector(queryText)
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
    // parquet count(*) is metadata-only (no data scan) — cheap even at scale
    val m = corpus.count()
    // tf feeds BOTH dfreq and tfidf; at 100 TB this relation is corpus-sized,
    // so persist it instead of re-running the explode+groupBy per consumer
    // (the bench's per-pass unpersist reclaims it between runs).
    val tf = corpus
      .select(col(docId).as("doc_id"),
        explode(split(lower(col(textCol)), "\\s+")).as("t"))
      .where(col("t") =!= "")
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .persist()
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val tfidf = tf.join(dfreq, "t")
      .withColumn("w", col("tf") * log((lit(m) + 1.0) / (col("df") + 1.0)))
    // query terms: counts from the same tokenizer; unseen terms keep
    // df = 0 (idf = ln(m+1)) — they cannot match any doc but DO contribute
    // to the query norm, exactly as the fitted MLlib model's query vector
    val qCounts = HashEmbedder.tokenize(queryText)
      .groupBy(identity).map { case (t, ts) => (t, ts.length.toDouble) }.toSeq
    val qDf = broadcast(qCounts.toDF("t", "qtf"))
    val qW = qDf.join(dfreq, Seq("t"), "left")
      .withColumn("qw", col("qtf") * log((lit(m) + 1.0) / (coalesce(col("df"), lit(0L)) + 1.0)))
    val qNorm = qW.agg(sqrt(sum(col("qw") * col("qw"))).as("qnorm"))
    // one pass over tfidf: left-join the (broadcast, tiny) query weights and
    // compute dnorm = √Σw² and dot = Σ w·qw in the SAME aggregation — the
    // round-3 shape ran the tfidf lineage twice (docNorm + dot groupBys).
    tfidf
      .join(broadcast(qW.select(col("t"), col("qw"))), Seq("t"), "left")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("w") * coalesce(col("qw"), lit(0.0))).as("dot"),
        sqrt(sum(col("w") * col("w"))).as("dnorm"))
      .crossJoin(broadcast(qNorm))
      .select(col("doc_id"),
        round(col("dot") / (col("dnorm") * col("qnorm")), 6).as("score"))
      .where(col("score") > 0.0)
  }

  /** The tf-idf "index": fitted MLlib model (hashed feature space, for
    * candidate generation), transformed document features, and the exact
    * term-space relations the rescorer needs — per-(doc,term) tf, document
    * frequencies, per-doc L2 norms, corpus size. All INGEST-TIME artifacts
    * (the fitted IDFModel is the "model artifact" of bulk indexing); a query
    * touches only its own terms' postings plus the persisted norms. */
  case class TfIdfIndex(model: TfIdf, features: DataFrame, termTf: DataFrame,
      dfreq: DataFrame, docNorm: DataFrame, numDocs: Long)

  def buildTfIdfIndex(corpus: DataFrame, textCol: String = "text",
      docId: String = "doc_id", numFeatures: Int = DefaultNumFeatures): TfIdfIndex = {
    val model = fitTfIdf(corpus, textCol, numFeatures)
    val features = model.transform(corpus, textCol)
      .select(col(docId).as("doc_id"), col("features")).persist()
    val termTf = corpus
      .select(col(docId).as("doc_id"),
        explode(split(lower(col(textCol)), "\\s+")).as("t"))
      .where(col("t") =!= "")
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .persist()
    val dfreq = termTf.groupBy(col("t")).agg(count(lit(1)).as("df")).persist()
    val numDocs = corpus.count()
    val docNorm = termTf.join(dfreq, "t")
      .withColumn("w", col("tf") * log((lit(numDocs) + 1.0) / (col("df") + 1.0)))
      .groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("dnorm"))
      .persist()
    features.count(); termTf.count(); dfreq.count(); docNorm.count()
    TfIdfIndex(model, features, termTf, dfreq, docNorm, numDocs)
  }

  /** Exact term-space tf-idf scores against a prebuilt index: the only
    * distributed work proportional to the corpus is the inner join of the
    * (broadcast, tiny) query-term weights against the persisted postings —
    * docs sharing no query term never enter the plan. Query-side weights
    * and norm are computed driver-side from a ≤|query terms| lookup in the
    * persisted dfreq (same k-rows-collect shape as Seismic's θ seed). */
  def tfIdfExactScoresIndexed(index: TfIdfIndex, queryText: String): DataFrame = {
    val spark = index.termTf.sparkSession
    import spark.implicits._
    val m = index.numDocs
    val qCounts = HashEmbedder.tokenize(queryText)
      .groupBy(identity).map { case (t, ts) => (t, ts.length.toDouble) }.toSeq
    val dfMap = index.dfreq.where(col("t").isin(qCounts.map(_._1): _*)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val qw = qCounts.map { case (t, qtf) =>
      (t, qtf * math.log((m + 1.0) / (dfMap.getOrElse(t, 0L) + 1.0)), dfMap.getOrElse(t, 0L)) }
    val qnorm = math.sqrt(qw.map(p => p._2 * p._2).sum)
    index.termTf
      .join(broadcast(qw.toDF("t", "qw", "df")), "t")
      .withColumn("w", col("tf") * log((lit(m) + 1.0) / (col("df") + 1.0)))
      .groupBy(col("doc_id"))
      .agg(sum(col("w") * col("qw")).as("dot"))
      .join(index.docNorm, "doc_id")
      .select(col("doc_id"),
        round(col("dot") / (col("dnorm") * lit(qnorm)), 6).as("score"))
      .where(col("score") > 0.0)
  }

  /** Two-stage tf-idf top-k: MLlib candidates (hashed-space pipeline),
    * engine exact rescore, final top-k. Pass a prebuilt [[buildTfIdfIndex]]
    * to measure query cost against the ingest-time index. */
  def tfIdfTopKRescored(corpus: DataFrame, queryText: String, k: Int,
      candidateFactor: Int = 5, textCol: String = "text",
      docId: String = "doc_id", index: Option[TfIdfIndex] = None): DataFrame = {
    index match {
      case Some(idx) =>
        val cands = tfIdfTopK(idx.model, idx.features, queryText, k * candidateFactor,
          textCol, "doc_id", preTransformed = true)
          .select(col("doc_id"))
        tfIdfExactScoresIndexed(idx, queryText)
          .join(cands, Seq("doc_id"), "left_semi")
          .orderBy(col("score").desc, col("doc_id").asc)
          .limit(k)
      case None =>
        val model = fitTfIdf(corpus, textCol)
        val cands = tfIdfTopK(model, corpus, queryText, k * candidateFactor, textCol, docId)
          .select(col("doc_id"))
        tfIdfExactScores(corpus, queryText, textCol, docId)
          .join(cands, Seq("doc_id"), "left_semi")
          .orderBy(col("score").desc, col("doc_id").asc)
          .limit(k)
    }
  }

  /** The MLlib-minhash "index": LSH signature entries (id, band, hv) for
    * candidate generation, the per-doc shingle-hash arrays (sorted, distinct
    * 64-bit hashes) for exact verification, and their pre-join `banded`
    * (band, hv, id, shh) — the relation the query-time bucket aggregation
    * consumes. All INGEST-TIME artifacts, exactly like the SEISMIC clustered
    * index: built once when documents are written. */
  case class MinhashIndex(sigs: DataFrame, shingleHashes: DataFrame, banded: DataFrame)

  /** 64-bit shingle hash (two seeded murmur32 halves). Verification on
    * these is exact w.h.p.: a pair's Jaccard differs from the string-set
    * Jaccard only on a 64-bit collision within that pair's shingle universe
    * (~10³ values in 2^64 — P ≈ 1e-13 per pair). */
  private def shingleHash64(s: String): Long = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(s, 0x1b873593).toLong
    val h2 = scala.util.hashing.MurmurHash3.stringHash(s, 0x85ebca6b).toLong
    (h1 << 32) | (h2 & 0xffffffffL)
  }

  def buildMinhashIndex(corpus: DataFrame, textCol: String = "text",
      docId: String = "doc_id", shingleSize: Int = 3,
      numFeatures: Int = DefaultNumFeatures,
      numHashTables: Int = 8, seed: Long = 42L): MinhashIndex = {
    import org.apache.spark.ml.functions.vector_to_array
    val shinglesUdf = udf((s: String) =>
      graft.dedup.Dedup.shingles(s, shingleSize).toSeq)
    val tf = new HashingTF().setInputCol("__words").setOutputCol("__tf")
      .setNumFeatures(numFeatures).setBinary(true)
    val feats = tf.transform(
      corpus.withColumn("__words", shinglesUdf(col(textCol))))
      .select(col(docId).as("id"), col("__tf").as("features"))
      .where(udf((v: MlVector) => v.numNonzeros > 0).apply(col("features")))
      .persist() // fit + transform both consume it — don't re-run the shingle UDF
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("__hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
    val sigs = lsh.fit(feats).transform(feats)
      .select(col("id"), posexplode(col("__hashes")).as(Seq("band", "h")))
      .select(col("id"), col("band"), vector_to_array(col("h")).getItem(0).as("hv"))
      .persist()
    val shhUdf = udf((s: String) => {
      val set = graft.dedup.Dedup.shingles(s, shingleSize)
      val arr = new Array[Long](set.size)
      var i = 0
      set.foreach { x => arr(i) = shingleHash64(x); i += 1 }
      java.util.Arrays.sort(arr)
      // drop (vanishingly rare) in-doc collisions to keep |set| faithful
      var n = 0; var k = 0
      while (k < arr.length) { if (k == 0 || arr(k) != arr(k - 1)) { arr(n) = arr(k); n += 1 }; k += 1 }
      if (n == arr.length) arr else java.util.Arrays.copyOf(arr, n)
    })
    val shh = corpus
      .select(col(docId).as("id"), shhUdf(col(textCol)).as("shh"))
      .persist()
    val banded = sigs.join(shh, "id")
      .select(col("band"), col("hv"), col("id"), col("shh"))
      .persist()
    banded.count() // materialize (pulls sigs + shh through) so feats can drop
    feats.unpersist(blocking = false)
    MinhashIndex(sigs, shh, banded)
  }

  /** MinHash band-bucket candidate pairs from a [[minhashSignatures]]
    * relation. Pair generation is an id-only shuffle: self-join on
    * (band, hash). `approxSimilarityJoin` carries the FULL feature vector
    * (the doc's entire shingle set) through its explode-join shuffle and
    * then computes vector-Jaccard per candidate — both wasted here, because
    * the rescore stage recomputes exact string-shingle Jaccard anyway.
    * Candidate set ⊇ approxSimilarityJoin's at any distance cut (no
    * distance filter at all), so the verified relation is unchanged. */
  def minhashCandidatePairs(sigs: DataFrame): DataFrame =
    sigs.as("a")
      .join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.hv") === col("b.hv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

  /** Two-stage near-dup pairs: MinHash band-bucket candidates (MLlib
    * signatures, id-only shuffle — see [[minhashCandidatePairs]]), engine
    * exact shingle-Jaccard verification at the real threshold. Verification
    * is a merge-intersect over the index's sorted shingle-hash arrays —
    * allocation-free per pair (r=1 MLlib banding makes candidates plentiful,
    * so per-pair cost is the bottleneck; Set-of-String Jaccard benched ~8×
    * slower here). Pass a prebuilt [[buildMinhashIndex]] to measure query
    * cost against the ingest-time index (the bench/serving shape). */
  def minhashNearDupRescored(corpus: DataFrame, threshold: Double = 0.5,
      textCol: String = "text", docId: String = "doc_id",
      shingleSize: Int = 3, index: Option[MinhashIndex] = None): DataFrame = {
    val idx = index.getOrElse(buildMinhashIndex(corpus, textCol, docId, shingleSize))
    val spark = idx.banded.sparkSession
    import spark.implicits._
    // One aggregation over the prebuilt (band, hv, id, shh) relation: each
    // bucket emits its member pairs with exact Jaccard computed inline
    // (merge-intersect of the sorted hash arrays — allocation-free). A pair
    // colliding in several bands is recomputed per band (deterministic, so
    // dropDuplicates keeps any) — the duplication factor is small and buys
    // a plan with ONE wide shuffle + one dedup instead of self-join +
    // distinct + two broadcast-hash-join builds per query. Per-bucket work
    // is O(members²) — the same skew story as Dedup.bucketPairs (AQE).
    idx.banded.as[(Int, Double, Long, Array[Long])]
      .groupByKey { case (band, hv, _, _) => (band, hv) }
      .flatMapGroups { (_, it) =>
        val members = it.map { case (_, _, id, shh) => (id, shh) }.toArray
        val out = Seq.newBuilder[(Long, Long, Double)]
        var i = 0
        while (i < members.length) {
          var j = i + 1
          while (j < members.length) {
            val (ia, sa) = members(i); val (ib, sb) = members(j)
            if (ia != ib) {
              var p = 0; var q = 0; var inter = 0
              while (p < sa.length && q < sb.length) {
                val x = sa(p); val y = sb(q)
                if (x == y) { inter += 1; p += 1; q += 1 }
                else if (x < y) p += 1
                else q += 1
              }
              val uni = sa.length + sb.length - inter
              val jc = if (uni == 0) 1.0 else inter.toDouble / uni
              if (jc >= threshold)
                out += (if (ia < ib) (ia, ib, jc) else (ib, ia, jc))
            }
            j += 1
          }
          i += 1
        }
        out.result().iterator
      }
      .toDF("id_a", "id_b", "__raw")
      .dropDuplicates("id_a", "id_b")
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
    * identical and the approx join degenerates to all-pairs.
    *
    * COMPATIBILITY PATH ONLY: `approxSimilarityJoin` shuffles the exploded
    * signature relation with full feature vectors attached — at scale use
    * [[graft.dedup.Dedup.minhashLsh]] (engine-owned single-pass banding) or
    * the [[minhashCandidatePairs]]+exact-rescore cascade. */
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
