package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Round-18 pins (optimization round — VERDICT r17 #1 / ADVICE r17 #1):
  * the byte-quantized prefilter is honored on the DUPLICATE-VECTOR
  * COLLAPSE branch of [[Dedup.embeddingNearDupLsh]] too (r17 wired only
  * the duplicate-free branch, so a replicated corpus silently lost the
  * lever). Pinned two ways:
  *
  *  - output identity: a corpus WITH replicated vectors (which routes the
  *    collapse branch — count > countDistinct on the vector hashes)
  *    produces the identical pair set with the prefilter on or off;
  *  - plan shape: with the prefilter on, the collapse branch's physical
  *    plan contains the codegen [[graft.functions.VectorExpressions
  *    .ByteDot]] kernel (`byte_dot`), proving the slim verification join
  *    actually engages rather than being optimized away.
  */
class Round18Spec extends SparkSpec {
  import spark.implicits._

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Corpus with genuine duplicate vectors: every base vector appears
    * 3x under distinct ids, plus near-duplicates and a zero vector. */
  private def replicatedVectors(seed: Long, n: Int, dim: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val nm = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(x => (x / nm).toFloat)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Float])]
    var id = 0L
    (0 until n).foreach { _ =>
      val b = unit()
      (0 until 3).foreach { _ => out += ((id, b.toSeq)); id += 1 } // replicas
      val near = b.zipWithIndex.map { case (x, i) =>
        (x + (if (i % 7 == 0) 0.05f else 0f)) }
      out += ((id, near.toSeq)); id += 1
    }
    out += ((id, Seq.fill(dim)(0f))); id += 1
    out.toSeq
  }

  test("quant prefilter engages on the duplicate-collapse branch: identical output + ByteDot in the plan") {
    val dim = 16
    val vecs = replicatedVectors(18181L, 12, dim).toDF("vec_id", "embedding")
    // replicated ids => the collapse branch (count > countDistinct)
    val plain = Dedup.embeddingNearDupLsh(vecs, dim = dim,
      threshold = 0.6, nbits = 4, tables = 4)
    val quant = Dedup.embeddingNearDupLsh(vecs, dim = dim,
      threshold = 0.6, nbits = 4, tables = 4, quantPrefilter = Some(true))
    assert(pairSet(plain) == pairSet(quant),
      "collapse-branch output changed under the prefilter")
    assert(pairSet(plain).nonEmpty, "fixture must produce pairs")
    val plan = quant.queryExecution.executedPlan.toString
    assert(plan.contains("byte_dot"),
      "collapse-branch plan lacks the ByteDot prefilter kernel")
    assert(!plain.queryExecution.executedPlan.toString.contains("byte_dot"),
      "prefilter-off plan unexpectedly contains byte_dot")
  }

  test("quant prefilter with maxBucket on the collapse branch stays output-identical") {
    val dim = 16
    val vecs = replicatedVectors(28282L, 10, dim).toDF("vec_id", "embedding")
    val plain = Dedup.embeddingNearDupLsh(vecs, dim = dim,
      threshold = 0.6, nbits = 2, tables = 4, maxBucket = Some(8))
    val quant = Dedup.embeddingNearDupLsh(vecs, dim = dim,
      threshold = 0.6, nbits = 2, tables = 4, maxBucket = Some(8),
      quantPrefilter = Some(true))
    assert(pairSet(plain) == pairSet(quant),
      "capped collapse-branch output changed under the prefilter")
  }
}
