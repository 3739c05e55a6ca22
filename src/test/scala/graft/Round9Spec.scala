package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ml.HashEmbedder
import graft.post.{Highlight, Rerank, SimilaritySpanScorer, SpanScorer}

/** Round-9 additions: the written-IVF gate path, bucketed bipartite
  * embedding decontamination, sparse MMR, the one-scan-per-step funnel,
  * and the SpanScorer seam. */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------ IVF written index

  test("q_ann_ivf_pruned: written index probes via partition pruning and equals q_ann_ivf") {
    val dir = "/root/testdata/sf0.001"
    val pruned = SparkEntry.queries("q_ann_ivf_pruned")(spark, dir)
    // the centroid_id probe must reach the scan as a PARTITION filter
    // (directory pruning), not a post-scan predicate — the claimed 100 TB
    // mechanism, now on the oracled/benched path
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      s"probe is not partition pruning:\n$plan")
    assert(!plan.contains("PartitionFilters: []"),
      s"partition filter list is empty:\n$plan")
    val inMem = SparkEntry.queries("q_ann_ivf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fromDisk = pruned.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromDisk == inMem && inMem.nonEmpty)
  }

  // ------------------------------------- bipartite embedding decontamination

  private def randVec(rnd: scala.util.Random, dim: Int): Array[Float] =
    Array.fill(dim)(rnd.nextGaussian().toFloat)

  /** Driver-side reference: same planes, same candidate rule (≥1 shared
    * table signature), same hoisted-norm round-6 cosine. */
  private def lshDecontRef(train: Seq[(Long, Array[Float])],
      bench: Seq[(Long, Array[Float])], dim: Int, threshold: Double,
      nbits: Int, tables: Int): Set[(Long, Long, Double)] = {
    val planes = Dedup.lshPlanes(tables, nbits, dim, 42L)
    def sigs(v: Array[Float]): Seq[Long] = (0 until tables).map { t =>
      (0 until nbits).foldLeft(0L) { (sig, b) =>
        val dot = v.zip(planes(t)(b)).map { case (x, p) => x.toDouble * p }.sum
        if (dot >= 0) sig | (1L << b) else sig
      }
    }
    def nrm(v: Array[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
    (for {
      (ta, va) <- train; (tb, vb) <- bench
      if sigs(va).zip(sigs(vb)).exists { case (a, b) => a == b }
      dot = va.zip(vb).map { case (x, y) => x.toDouble * y }.sum
      cos = if (nrm(va) == 0.0 || nrm(vb) == 0.0) 0.0 else dot / (nrm(va) * nrm(vb))
      r = BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if r >= threshold
    } yield (ta, tb, r)).toSet
  }

  test("decontaminateEmbeddingLsh matches the driver reference (no duplicates)") {
    val rnd = new scala.util.Random(9)
    val dim = 16
    val base = (0 until 30).map(i => (i.toLong, randVec(rnd, dim)))
    // bench = perturbed copies of some train vectors (real leakage) + noise
    val bench = (0 until 8).map { i =>
      val src = base(i * 3)._2
      (100L + i, src.map(x => x + rnd.nextGaussian().toFloat * 0.05f))
    }
    val trainDf = base.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val benchDf = bench.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val got = Dedup.decontaminateEmbeddingLsh(trainDf, benchDf, dim,
      threshold = 0.8, nbits = 4, tables = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = lshDecontRef(base, bench, dim, 0.8, nbits = 4, tables = 6)
    assert(got == want)
    assert(want.nonEmpty, "fixture must produce at least one flagged pair")
  }

  test("decontaminateEmbeddingLsh: duplicate-vector collapse is output-invariant") {
    val rnd = new scala.util.Random(11)
    val dim = 16
    val base = (0 until 12).map(i => (i.toLong, randVec(rnd, dim)))
    // replicate every train vector 3x (verbatim) and bench 2x — the
    // collapse path must expand to exactly the uncollapsed pair set
    val train = base.flatMap { case (id, v) =>
      (0 until 3).map(r => (id + 100L * r, v)) }
    val bench = base.take(5).flatMap { case (id, v) =>
      Seq((1000L + id, v), (2000L + id, v.map(x => x + 0.01f))) }
    val trainDf = train.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val benchDf = bench.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val got = Dedup.decontaminateEmbeddingLsh(trainDf, benchDf, dim,
      threshold = 0.9, nbits = 3, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = lshDecontRef(train, bench, dim, 0.9, nbits = 3, tables = 4)
    assert(got == want)
    assert(want.nonEmpty)
  }

  // ------------------------------------------------------------- sparse MMR

  test("mmrSparse: lambda=1 reduces to pure relevance ranking") {
    val cands = Array(
      (1L, 0.9, Map("a" -> 1.0f, "b" -> 2.0f)),
      (2L, 0.8, Map("a" -> 1.0f, "b" -> 2.0f)), // redundant with 1
      (3L, 0.7, Map("z" -> 5.0f)))
    val sel = Rerank.mmrSparse(cands, k = 3, lambda = 1.0)
    assert(sel.map(_._1) == Seq(1L, 2L, 3L))
  }

  test("mmrSparse: diversity demotes the redundant candidate") {
    val cands = Array(
      (1L, 0.9, Map("a" -> 1.0f, "b" -> 2.0f)),
      (2L, 0.89, Map("a" -> 1.0f, "b" -> 2.0f)), // near-identical to 1
      (3L, 0.5, Map("z" -> 5.0f)))               // orthogonal
    val sel = Rerank.mmrSparse(cands, k = 2, lambda = 0.5)
    assert(sel.map(_._1) == Seq(1L, 3L), s"got $sel")
  }

  test("mmrSparse matches a brute greedy reference on random maps") {
    val rnd = new scala.util.Random(3)
    val vocab = (0 until 12).map(i => s"t$i")
    val cands = (1L to 20L).map { id =>
      val m = vocab.filter(_ => rnd.nextBoolean())
        .map(t => t -> (0.1f + rnd.nextFloat())).toMap
      (id, BigDecimal(rnd.nextDouble()).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        if (m.isEmpty) Map(vocab.head -> 1.0f) else m)
    }.toArray
    def cos(a: Map[String, Float], b: Map[String, Float]): Double = {
      val dot = a.keySet.intersect(b.keySet).toSeq.sorted
        .map(t => a(t).toDouble * b(t).toDouble).sum
      val na = math.sqrt(a.values.map(w => w.toDouble * w.toDouble).sum)
      val nb = math.sqrt(b.values.map(w => w.toDouble * w.toDouble).sum)
      val c = if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * nb)
      BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val lambda = 0.5
    val vecOf = cands.map(c => c._1 -> c._3).toMap
    var remaining = cands.map(c => (c._1, c._2)).toList
    var selected = List.empty[Long]
    val expect = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (expect.length < 8 && remaining.nonEmpty) {
      val best = remaining.maxBy { case (id, rel) =>
        val maxSim = if (selected.isEmpty) 0.0
        else selected.map(s => cos(vecOf(id), vecOf(s))).max
        (lambda * rel - (1 - lambda) * maxSim, -id.toDouble)
      }
      expect += best._1
      selected ::= best._1
      remaining = remaining.filterNot(_._1 == best._1)
    }
    val got = Rerank.mmrSparse(cands, k = 8, lambda = lambda).map(_._1)
    assert(got == expect.toSeq)
  }

  // ------------------------------------------------------------ plan shapes

  test("ngramJaccardPairsPrefix: prefix selection is window-free (row-local slice)") {
    // the r8 form ran two global windows partitioned by doc over the whole
    // (id, shingle, df) relation — the suite's steepest scaling slope; the
    // flattened form must not reintroduce a Window exchange anywhere
    // (the operator returns a persisted relation, so the printed tree
    // includes the cached plan — round-8 lore)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = Dedup.ngramJaccardPairsPrefix(docs, threshold = 0.5)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"prefix selection still runs a window:\n$plan")
  }

  test("decontaminateEmbeddingLsh: bench buckets broadcast into candidate generation") {
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val df = Dedup.decontaminateEmbeddingLsh(
        emb.where(col("vec_id") % 50 =!= 0),
        emb.where(col("vec_id") % 50 === 0),
        dim = 64, threshold = 0.45, nbits = 4, tables = 8)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"bench side not broadcast on the (table, bucket) join:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  // ------------------------------------------------- funnel scan efficiency

  test("funnel scans the events relation once per step, not O(steps^2)") {
    val acc = spark.sparkContext.longAccumulator("funnel_scans")
    val rows = for (u <- 1L to 100L; s <- 0 until 6)
      yield (u, s"s$s", (s * 100 + u % 7).toLong)
    val df = rows.toDF("user_id", "event_type", "ts0")
    val countingTs = udf((t: Long) => { acc.add(1); t }).asNondeterministic()
    val instrumented = df.withColumn("ts_ns", countingTs(col("ts0")))
    val steps = (0 until 6).map(i => s"s$i")
    val out = graft.events.EventAnalytics.funnel(instrumented, steps)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(steps.forall(s => out(s) == 100L), s"got $out") // every user completes
    // one-pass shape: each of the 6 frontier materializations evaluates the
    // UDF over (at most) every row once -> <= 6 * 600 with slack for a
    // partial re-evaluation; the lazy O(N^2) form re-runs step i's chain
    // per downstream step -> >= 600 * (1+2+...+6) = 12600 even with
    // perfect filter pushdown
    val n = acc.value
    assert(n <= 2L * 6 * 600, s"funnel re-scanned events: $n UDF evaluations")
  }

  // --------------------------------------- SortedIntersectCount expression

  test("sorted_intersect_count: merge semantics, nulls, empties, codegen+interpreted") {
    import graft.functions.VectorExpressions.sorted_intersect_count
    val df = Seq(
      (1L, Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)), // 2 common
      (2L, Seq.empty[Long], Seq(1L, 2L)),              // empty left
      (3L, Seq(7L), Seq(7L)),                          // full overlap
      (4L, Seq(-5L, 0L, 4L), Seq(-5L, 4L, 8L))         // negatives sort first
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), sorted_intersect_count(col("a"), col("b")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 0L, 3L -> 1L, 4L -> 2L))
    // null in -> null out (BinaryExpression null-safety)
    val withNull = df.select(
      sorted_intersect_count(when(col("id") === 1L, col("a")), col("b")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSet
    assert(withNull.contains(-1L))
    // wrong element type is a type-check error, not silent misreads
    val err = intercept[Exception] {
      Seq((Seq(1, 2), Seq(2, 3))).toDF("a", "b")
        .select(sorted_intersect_count(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.contains("array<bigint>") ||
      err.getMessage.toLowerCase.contains("datatype"), err.getMessage)
  }

  // ------------------------------------------------------- windowed funnel

  test("funnel conversion window drops slow converters, keeps anchors first-touch") {
    val df = Seq(
      (1L, "view", 100L), (1L, "click", 150L),  // converts within gap 100
      (2L, "view", 100L), (2L, "click", 500L),  // outside gap -> drops
      // user 3: first in-window click at 180 is the anchor even though a
      // later one exists
      (3L, "view", 100L), (3L, "click", 180L), (3L, "click", 190L),
      // user 4: out-of-window click only, then nothing
      (4L, "view", 100L), (4L, "click", 201L)
    ).toDF("user_id", "event_type", "ts_ns")
    val out = graft.events.EventAnalytics.funnel(df, Seq("view", "click"),
      maxGapNs = Some(100L))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(out == Map("view" -> 4L, "click" -> 2L), s"got $out")
    // unwindowed form unchanged
    val full = graft.events.EventAnalytics.funnel(df, Seq("view", "click"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(full == Map("view" -> 4L, "click" -> 4L))
  }

  // --------------------------------------------------------- SpanScorer seam

  test("answerSpan: default path equals an explicit SimilaritySpanScorer") {
    val q = "spark join fast table"
    val doc = "spark join is fast. tables scan slowly in the engine. nothing else here."
    val d = Highlight.answerSpan(q, doc)
    val e = Highlight.answerSpan(q, doc, scorer = Some(SimilaritySpanScorer()))
    assert(d == e && d.nonEmpty)
  }

  test("answerSpan: a fake-logits QA head drops in without changing span mechanics") {
    // start/end logits derived from the window's boundary tokens — the
    // exact shape a real QUESTION_ANSWERING model produces. The scorer
    // prefers windows starting at "gamma" and ending at "delta".
    object FakeLogits extends SpanScorer {
      def score(queryText: String, windowText: String): Double = {
        val toks = windowText.split("\\s+").filter(_.nonEmpty)
        if (toks.isEmpty) 0.0
        else (if (toks.head == "gamma") 0.6 else 0.1) +
          (if (toks.last == "delta") 0.4 else 0.05)
      }
    }
    // single sentence: the (scorer-independent) top-sentence pick is fixed
    val doc = "alpha beta gamma delta epsilon tail"
    val q = "alpha beta gamma"
    val got = Highlight.answerSpan(q, doc, scorer = Some(FakeLogits))
    assert(got.nonEmpty)
    val (ord, s0, e0, sim) = got.get
    assert(ord == 1) // segmentSentences ords are 1-based
    // the emitted char span must be exactly the "gamma delta" window of the
    // ORIGINAL text — same offset mechanics as the default scorer
    assert(doc.substring(s0, e0) == "gamma delta", s"got '${doc.substring(s0, e0)}'")
    assert(sim == 1.0) // 0.6 + 0.4 round-6
  }
}
