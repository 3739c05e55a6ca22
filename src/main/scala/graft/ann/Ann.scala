package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Approximate-nearest-neighbor search over a dense embedding column —
  * the Spark counterpart of the reference's k-NN retrieval target
  * (query/NeuralKNNQueryBuilder.java delegates to the k-NN plugin's HNSW;
  * a graph index is the wrong shape for Spark scans, so the scale path is
  * IVF: coarse quantizer + probed partitions, the standard batch-ANN
  * design).
  *
  *   - bruteForceTopK: exact cosine top-k. One scan + TakeOrdered. The
  *     correctness baseline for every approximate variant.
  *   - IVF: k-means-lite centroids (deterministic seeded init + n refine
  *     iterations, computed once at build) → assignments table; query
  *     probes `nprobe` nearest centroids and scans only those partitions.
  *     At 100 TB the assignments table is partitioned by centroid_id so a
  *     probe is partition pruning, not a scan.
  */
object Ann {

  /** Exact top-k by cosine (score rounded for cross-engine determinism). */
  def bruteForceTopK(df: DataFrame, query: Array[Float], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol).as("vec_id"),
      round(VectorExpressions.dense_cosine(col(vecCol), typedLit(query)), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)

  /** Batch of queries against the corpus: queries as a small broadcast DF
    * (query_id, qvec) — one corpus scan for ALL queries. */
  def bruteForceTopKBatch(df: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val scored = df.crossJoin(broadcast(queries))
      .select(col("query_id"), col(idCol).as("vec_id"),
        round(VectorExpressions.dense_cosine(col(vecCol), col("qvec")), 6).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  // -------------------------------------------------------------------- IVF

  /** Deterministic centroid training: seeded sample init + `iters` Lloyd
    * refinements, executed distributed (agg per centroid), centroids
    * collected to the driver (nlist × dim floats — small). */
  def trainCentroids(df: DataFrame, dim: Int, nlist: Int, iters: Int = 2,
      vecCol: String = "embedding", seed: Long = 42L): Array[Array[Float]] = {
    var centroids = df.select(col(vecCol))
      // secondary sort on the vector's string form: hash ties (identical
      // vectors, or collisions) would otherwise resolve by partition order
      // and make the seed set layout-dependent
      .orderBy(xxhash64(col(vecCol).cast("string"), lit(seed)), col(vecCol).cast("string"))
      .limit(nlist)
      .collect()
      .map(_.getSeq[Float](0).toArray)
    var it = 0
    while (it < iters) {
      val assigned = assign(df, centroids, vecCol)
      val means = assigned
        .groupBy(col("centroid_id"))
        .agg(array((0 until dim).map(i => avg(col(vecCol).getItem(i))): _*).as("mean"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).map(_.toFloat).toArray)
        .toMap
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i))).toArray
      it += 1
    }
    centroids
  }

  /** Data-independent seeded Gaussian centroids — a coarse quantizer whose
    * cell layout does not depend on the corpus (k-means with zero Lloyd
    * iterations). trainCentroids is the quality path; this one exists so
    * the assignment is reproducible from the seed alone (the oracle
    * generator inlines the identical centroid literals, the same protocol
    * as Dedup.lshPlanes). */
  def seededCentroids(nlist: Int, dim: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nlist, dim)(rnd.nextGaussian().toFloat)
  }

  /** Assign each vector to its max-cosine centroid (codegen'd, no shuffle).
    * Scores land in one array column and the argmax is
    * array_position(scores, array_max(scores)) — first max wins on ties.
    * (A when-chain fold here nests each prior score expression twice per
    * step → exponential generated code → janino's 64 KB method limit →
    * silent interpreted fallback; the array form stays linear.)
    *
    * `roundDp ≥ 0` rounds each cosine before the argmax: cross-engine
    * cell-assignment determinism (double sums in different orders diverge
    * in the last ulp, which at a cell boundary flips the assignment). */
  def assign(df: DataFrame, centroids: Array[Array[Float]],
      vecCol: String = "embedding", roundDp: Int = -1): DataFrame = {
    val scores = array(centroids.map { c =>
      val sc = VectorExpressions.dense_cosine(col(vecCol), typedLit(c))
      if (roundDp >= 0) round(sc, roundDp) else sc
    }: _*)
    df.withColumn("__cscores", scores)
      .withColumn("centroid_id",
        // null embedding -> every cosine null -> sentinel -1 (never probed,
        // never a null groupBy key in trainCentroids' refinement)
        coalesce(
          (array_position(col("__cscores"), array_max(col("__cscores"))) - 1).cast("int"),
          lit(-1)))
      .drop("__cscores")
  }

  /** Join-form centroid assignment for LARGE nlist — identical contract to
    * [[assign]] (round-`roundDp` cosines, argmax with first-max/lowest-id
    * tie-break) plus a `centroid_cos` column (the winning cosine, which the
    * SemDeDup keeper rule needs anyway). [[assign]] inlines nlist cosine
    * expressions into ONE generated method: past a few dozen centroids the
    * method outgrows the JIT compile threshold and runs as interpreted
    * bytecode (measured: nlist=80 on 5 000 vectors was 6× slower than
    * nlist=8 — the cost cliff is codegen, not math). Here centroids are a
    * broadcast RELATION: per (vector, centroid) cosine rows through the
    * normal codegen'd kernel, argmax as a max-of-struct AGGREGATION keyed
    * on the vector id — nlist scales to the thousands (SemDeDup's k=11k
    * regime) with no giant method anywhere. The aggregation gets map-side
    * partial combine, so the shuffle carries ~n one-row argmax states
    * instead of the n×nlist cosine rows the previous rank-window form
    * sorted (VERDICT r12 task #4); struct ordering is lexicographic, so
    * max(struct(cosine, -ci)) reproduces the window's
    * (cosine desc, ci asc) first-max/lowest-id tie-break exactly — on the
    * ROUNDED cosine when roundDp ≥ 0, like the window ordered on `__cc`.
    * Null-embedding rows are dropped (the inline form maps them to
    * sentinel -1); callers with nullable vectors filter first, and ids
    * must be unique (the window form silently assumed the same). */
  def assignByJoin(df: DataFrame, centroids: Array[Array[Float]],
      idCol: String, vecCol: String = "embedding",
      roundDp: Int = -1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents = broadcast(
      centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("__ci", "__cvec"))
    val sc = VectorExpressions.dense_cosine(col(vecCol), col("__cvec"))
    val best = df.select(col(idCol), col(vecCol)).crossJoin(cents)
      .withColumn("__cc", if (roundDp >= 0) round(sc, roundDp) else sc)
      .where(col("__cc").isNotNull)
      .groupBy(col(idCol))
      .agg(max(struct(col("__cc").as("c"), (-col("__ci")).as("n"))).as("__m"))
      .select(col(idCol), (-col("__m.n")).cast("int").as("centroid_id"),
        col("__m.c").as("centroid_cos"))
    df.join(best, Seq(idCol))
  }

  /** Persist an IVF index: the assignments table partitioned BY CELL — at
    * read time `nprobe` probing becomes Parquet partition pruning (only the
    * probed centroid_id directories are listed and scanned), the scale
    * mechanism SCALE.md describes — plus the centroid table (nlist×dim
    * floats, trivially small). */
  def writeIndex(assigned: DataFrame, centroids: Array[Array[Float]], path: String,
      vecCol: String = "embedding", idCol: String = "vec_id"): Unit = {
    val spark = assigned.sparkSession
    import spark.implicits._
    assigned.select(col(idCol), col(vecCol), col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(s"$path/assignments")
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("i", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  def loadIndex(spark: org.apache.spark.sql.SparkSession, path: String):
      (DataFrame, Array[Array[Float]]) = {
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("i"), col("centroid")).orderBy(col("i")).collect()
      .map(_.getSeq[Float](1).toArray)
    (spark.read.parquet(s"$path/assignments"), cents)
  }

  /** IVF search: probe the `nprobe` centroids nearest to the query, exact
    * cosine within the probed cells only. */
  def ivfTopK(assigned: DataFrame, centroids: Array[Array[Float]],
      query: Array[Float], k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    bruteForceTopK(
      assigned.where(col("centroid_id").isin(
        probedCells(centroids, query, nprobe).toIndexedSeq: _*)),
      query, k, idCol, vecCol)

  /** Query-set-at-a-time IVF: ONE scan of the union of all probed cells
    * serves the whole query batch. Per-query probe sets are computed
    * driver-side (nlist × |batch| cosines — plan metadata); the cell union
    * lands as a static partition filter (Parquet partition pruning on a
    * written index), and the broadcast (query_id, centroid_id, qvec)
    * relation restricts each query to ITS probed cells inside the join.
    * Returns (query_id, vec_id, score, rank ≤ k) — the batchTopK shape. */
  def ivfTopKBatch(assigned: DataFrame, centroids: Array[Array[Float]],
      queries: Map[Long, Array[Float]], k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val probes = queries.toSeq.flatMap { case (qid, qv) =>
      probedCells(centroids, qv, nprobe).map(ci => (qid, ci, qv.toSeq))
    }
    val pDf = broadcast(probes.toDF("query_id", "centroid_id", "qvec"))
    val allCells = probes.map(_._2).distinct
    val scored = assigned
      .where(col("centroid_id").isin(allCells: _*)) // static partition pruning
      .join(pDf, "centroid_id")
      .select(col("query_id"), col(idCol).as("vec_id"),
        round(VectorExpressions.dense_cosine(col(vecCol), col("qvec")), 6).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** The `nprobe` centroid ids nearest to the query (driver-side — nlist
    * floats). Shared with the oracle generator so both engines probe the
    * identical cell set. */
  private[graft] def probedCells(centroids: Array[Array[Float]],
      query: Array[Float], nprobe: Int): Array[Int] =
    centroids.zipWithIndex
      .map { case (c, i) => (i, VectorExpressions.cosineArrays(c, query)) }
      .sortBy { case (i, s) => (-s, i) }
      .take(nprobe).map(_._1)

  // -------------------------------------------------------------------- PQ

  /** Product quantization — the 100 TB memory lever for dense ANN: an
    * m-subspace × ksub-entry codebook compresses each vector to m small
    * codes (64-dim float32 = 256 B → 4 B at m=4), and query-time scoring
    * is an ADC table lookup over the codes instead of a full-vector dot.
    * Codebooks are data-independent seeded Gaussians (same determinism
    * contract as [[seededCentroids]] — the DuckDB oracle inlines them as
    * literals; a trained k-means codebook drops in without changing any
    * query shape). */
  def seededCodebooks(m: Int, ksub: Int, subDim: Int,
      seed: Long = 7L): Array[Array[Array[Float]]] = {
    val rnd = new scala.util.Random(seed)
    // SPHERICAL codewords at the expected subvector scale: raw Gaussians
    // have norm ~√subDim while unit-norm corpus vectors have subvector
    // norm ~√(1/m) — with that mismatch ‖c‖² dominates `‖c‖² − 2·v·c` and
    // every row collapses onto the smallest-norm codeword (measured:
    // recall 0). Normalizing each codeword to the √(1/m) scale makes ‖c‖²
    // constant across the codebook, so assignment argmin ≡ argmax v·c — a
    // direction quantizer, the right untrained shape for cosine data.
    val target = math.sqrt(1.0 / m)
    Array.fill(m, ksub) {
      val g = Array.fill(subDim)(rnd.nextGaussian())
      val nrm = math.sqrt(g.map(x => x * x).sum)
      g.map(x => (x / nrm * target).toFloat)
    }
  }

  /** Encode vectors to PQ codes: per subspace, the argmin-L2² codebook
    * entry. L2² is expanded to `‖c‖² − 2·v·c` (the ‖v‖² term is constant
    * within a subspace and cannot change the argmin), computed as the
    * same rounded column expression in both engines; `array_position` of
    * the min takes the FIRST hit, so ties break toward the lower code on
    * both sides — the [[assign]] rounded-argmax trick, per subspace. */
  def pqEncode(df: DataFrame, codebooks: Array[Array[Array[Float]]],
      vecCol: String = "embedding", roundDp: Int = 6): DataFrame = {
    val subDim = codebooks(0)(0).length
    val codeCols = codebooks.indices.map { j =>
      val sub = slice(col(vecCol), j * subDim + 1, subDim)
      val scores = array(codebooks(j).map { c =>
        val csq = c.map(x => x.toDouble * x.toDouble).sum
        round(lit(csq) - lit(2.0) * VectorExpressions.dense_dot(sub, typedLit(c)), roundDp)
      }: _*)
      (array_position(scores, array_min(scores)) - 1).cast("int")
    }
    df.withColumn("codes", array(codeCols: _*))
  }

  /** ADC search: score = Σ_j lut_j(code_j) with lut_j(k) = q_j · c_jk
    * (rounded per entry, then the sum rounded — the house rank-on-rounded
    * protocol), keep the top `window` candidates, then EXACT-cosine
    * rescore the window down to k — the rescore contract of the quantized
    * dense path (window covering the corpus ⇒ exact, AnnSpec invariant).
    * At scale the scan touches only (id, codes) — m ints per row — and
    * full vectors are fetched for `window` rows. */
  def pqAdcTopK(encoded: DataFrame, codebooks: Array[Array[Array[Float]]],
      query: Array[Float], k: Int, window: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val subDim = codebooks(0)(0).length
    val luts: Array[Seq[Double]] = codebooks.zipWithIndex.map { case (cb, j) =>
      cb.toSeq.map { c =>
        var d = 0.0; var i = 0
        while (i < subDim) { d += query(j * subDim + i).toDouble * c(i).toDouble; i += 1 }
        BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    val adc = round(luts.zipWithIndex.map { case (lut, j) =>
      element_at(typedLit(lut), element_at(col("codes"), j + 1) + 1)
    }.reduce(_ + _), 6)
    val candidates = encoded
      .select(col(idCol).as("vec_id"), col(vecCol), adc.as("__adc"))
      .orderBy(col("__adc").desc, col("vec_id").asc)
      .limit(window)
    candidates
      .select(col("vec_id"),
        round(VectorExpressions.dense_cosine(col(vecCol), typedLit(query)), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }
}
