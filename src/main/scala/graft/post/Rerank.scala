package graft.post

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ml.HashEmbedder

/** Response-stage processors over a (small) candidate result set —
  * SURVEY.md §2.4 `rerank` family + MMR:
  *   - by_field   (processor/rerank/ByFieldRerankProcessor.java:34-216):
  *     replace the score with a numeric field of the doc, re-sort.
  *   - ml_opensearch (processor/rerank/RescoringRerankProcessor.java:49-119):
  *     cross-encoder similarity(query_text, context_field) replaces score.
  *   - MMR (processor/mmr/MMRNeuralQueryTransformer.java:43-119 + k-NN
  *     plugin's reranker): greedy maximal-marginal-relevance selection of k
  *     from `candidates` docs: argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d,s).
  *
  * These operate on top-w candidates (w ≤ rerank window, reference caps
  * context fetch at 50 fields) — driver-side iteration over a collected
  * candidate set is the faithful AND scalable shape (w is small by
  * construction; the expensive part, candidate generation, stays
  * distributed).
  */
object Rerank {

  /** by_field: score := doc[targetField]; optionally keep previous score. */
  def byField(results: DataFrame, targetField: String,
      keepPreviousScore: Boolean = false): DataFrame = {
    val base = if (keepPreviousScore) results.withColumn("previous_score", col("score"))
    else results
    base
      .withColumn("score", col(targetField).cast("double"))
      .orderBy(col("score").desc, col("doc_id").asc)
  }

  private val similarityUdf = udf((q: String, d: String) => graft.ml.ModelRegistry.current.similarity(q, d).toDouble)

  /** ml rerank: cross-encoder stand-in = HashEmbedder.similarity. */
  def mlRerank(results: DataFrame, queryText: String, contextField: String): DataFrame =
    results
      .withColumn("score", round(similarityUdf(lit(queryText), col(contextField)), 6))
      .orderBy(col("score").desc, col("doc_id").asc)

  /** Shared greedy MMR core: argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s),
    * deterministic (value desc, id asc) tie-break, insertion-ordered
    * candidate map (duplicate ids collapse). The similarity kernel is the
    * only thing that differs between the dense and sparse forms. */
  private def mmrGreedy(candidates: Array[(Long, Double)],
      sim: (Long, Long) => Double, k: Int,
      lambda: Double): Seq[(Long, Double, Int)] = {
    val remaining = scala.collection.mutable.LinkedHashMap(candidates.map(c => c._1 -> c): _*)
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Int)]
    var rank = 1
    // bound on remaining.nonEmpty, not candidates.length: duplicate doc_ids
    // collapse in the map, and a length-based bound would maxBy on empty
    while (selected.length < k && remaining.nonEmpty) {
      val best = remaining.values.maxBy { case (id, rel) =>
        val maxSim = if (selected.isEmpty) 0.0
        else selected.iterator.map(s => sim(id, s._1)).max
        (lambda * rel - (1 - lambda) * maxSim, -id.toDouble) // deterministic tie-break
      }
      selected += ((best._1, best._2, rank))
      rank += 1
      remaining.remove(best._1)
    }
    selected.toSeq
  }

  /** MMR over dense vectors. `candidates`: (doc_id, score, vec: Array[Float]).
    * Greedy selection happens on the driver over the collected candidate set
    * (size = candidates ≈ k × expand, small); returns (doc_id, score, rank).
    */
  def mmr(candidates: Array[(Long, Double, Array[Float])], k: Int,
      lambda: Double = 0.5): Seq[(Long, Double, Int)] = {
    import graft.functions.VectorExpressions.cosineArrays
    val vecOf = candidates.map(c => c._1 -> c._3).toMap
    mmrGreedy(candidates.map(c => (c._1, c._2)),
      (a, b) => cosineArrays(vecOf(a), vecOf(b)), k, lambda)
  }

  /** MMR over SPARSE token-weight maps — the sparse-field analogue of the
    * reference's dense MMR transform
    * (processor/mmr/MMRNeuralQueryTransformer.java:44-118 widens the
    * candidate pool and resolves the stored vector field for the k-NN
    * plugin's greedy rerank; here the stored vector is the sparse token
    * map and the kernel is sparse cosine). Similarity is
    * sparse cosine with hoisted norms, rounded to 6 dp BEFORE the greedy
    * compare: the SQL oracle sums the identical float products in a
    * different order, and the house rank-on-rounded protocol keeps a
    * last-ulp divergence from flipping an argmax. */
  def mmrSparse(candidates: Array[(Long, Double, Map[String, Float])], k: Int,
      lambda: Double = 0.5): Seq[(Long, Double, Int)] = {
    val vecOf = candidates.map(c => c._1 -> c._3).toMap
    val normOf = vecOf.map { case (id, m) =>
      id -> math.sqrt(m.valuesIterator.map(w => w.toDouble * w.toDouble).sum)
    }
    def cos(a: Long, b: Long): Double = {
      val ma = vecOf(a); val mb = vecOf(b)
      val (small, big) = if (ma.size <= mb.size) (ma, mb) else (mb, ma)
      // sorted token order removes the map-iteration-order variable from
      // the double sum entirely (the round-6 would absorb it anyway)
      var dot = 0.0
      small.keysIterator.toArray.sorted.foreach { t =>
        big.get(t).foreach(w => dot += small(t).toDouble * w.toDouble)
      }
      val na = normOf(a); val nb = normOf(b)
      val c = if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * nb)
      BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    mmrGreedy(candidates.map(c => (c._1, c._2)), cos, k, lambda)
  }

  /** Sparse MMR as a DataFrame op: collect top-`candidates` with their
    * token maps, select k, return (doc_id, score, rank). */
  def mmrSparseRerank(results: DataFrame, tokCol: String, k: Int,
      lambda: Double = 0.5, candidates: Int = 100): DataFrame = {
    val spark = results.sparkSession
    import spark.implicits._
    val top = results
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(candidates)
      .select(col("doc_id").cast("long"), col("score").cast("double"), col(tokCol))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getMap[String, Float](2).toMap))
    mmrSparse(top, k, lambda).toDF("doc_id", "score", "rank")
  }

  /** MMR as a DataFrame op: collect top-`candidates`, select k, return DF. */
  def mmrRerank(results: DataFrame, vecCol: String, k: Int,
      lambda: Double = 0.5, candidates: Int = 100): DataFrame = {
    val spark = results.sparkSession
    import spark.implicits._
    val top = results
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(candidates)
      .select(col("doc_id").cast("long"), col("score").cast("double"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Float](2).toArray))
    mmr(top, k, lambda).toDF("doc_id", "score", "rank")
  }
}
