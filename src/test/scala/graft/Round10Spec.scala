package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ml.{HashModelClient, ModelClient, ModelRegistry}

/** Round-10 additions: probe-dispatched n-gram dedup strategy (the
  * `approximate_threshold` idea applied to dedup) and its regime pins. */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------- ngram strategy dispatch

  /** Density-preserving corpus: disjoint vocabularies, df=1 everywhere —
    * candidate volume 0 per doc, the uncapped regime at ANY row count. */
  private def uniformDocs = (0 until 20).map { i =>
    (i.toLong, (0 until 12).map(j => s"w${i}_$j").mkString(" "))
  }.toDF("doc_id", "text")

  /** Boilerplate regime: each doc is 50 unique tokens plus a shared 8-token
    * footer — the footer shingles are corpus-hot (df = nDocs), generate
    * nearly all candidate volume, but carry a small share of postings. */
  private def boilerplateDocs = (0 until 30).map { i =>
    val unique = (0 until 50).map(j => s"u${i}_$j").mkString(" ")
    (i.toLong, s"$unique standard corpus footer terms apply all rights reserved")
  }.toDF("doc_id", "text")

  /** Verbatim-duplication regime: 10 distinct long docs, 6 replicas each —
    * every shingle df=6 (under any sane cap), candidate volume blown but
    * spread across the whole df distribution. */
  private def sharedDocs = (0 until 60).map { i =>
    val base = i % 10
    (i.toLong, (0 until 40).map(j => s"d${base}_$j").mkString(" "))
  }.toDF("doc_id", "text")

  test("ngramStrategy: density-preserving corpus dispatches uncapped") {
    assert(Dedup.ngramStrategy(uniformDocs, cap = 5, budgetPerDoc = 50L) == "uncapped")
  }

  test("ngramStrategy: boilerplate regime dispatches capped") {
    assert(Dedup.ngramStrategy(boilerplateDocs, cap = 5, budgetPerDoc = 50L) == "capped")
  }

  test("ngramStrategy: verbatim-duplication regime dispatches prefix") {
    assert(Dedup.ngramStrategy(sharedDocs, cap = 100, budgetPerDoc = 50L) == "prefix")
  }

  test("ngramJaccardAuto matches the exact uncapped pairs on each regime fixture") {
    // capped diverges from exact ONLY on pairs whose entire overlap is
    // corpus-hot shingles; on the boilerplate fixture those are exactly the
    // boilerplate-only false near-dups below threshold, so all three
    // dispatches agree with exact jaccard here
    Seq(uniformDocs, boilerplateDocs, sharedDocs).foreach { docs =>
      val auto = Dedup.ngramJaccardAuto(docs, threshold = 0.5,
        cap = 100, budgetPerDoc = 50L)
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(auto == exact)
    }
  }

  // ------------------------------------ streaming embedding decontamination

  test("flagStreamEmbedding (AvailableNow) equals the batch bucketed LSH relation") {
    // sf0.01 (the driver-gate dir): the sf0.001 split has no pair at 0.45
    val dir = "/root/testdata/sf0.01"
    val streamed = SparkEntry.queries("q_stream_decontaminate_embedding")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val batch = Dedup.decontaminateEmbeddingLsh(
      emb.where(col("vec_id") % 50 =!= 0), emb.where(col("vec_id") % 50 === 0),
      dim = 64, threshold = 0.45, nbits = 4, tables = 8)
      .orderBy("train_id", "bench_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed == batch && batch.nonEmpty)
  }

  // ------------------------------------------------------ semantic dedup

  test("semanticDedup: one keeper per component, drops only in multi-member components") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val out = Dedup.semanticDedup(emb, dim = 64, nlist = 8, threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == emb.count())
    val byCluster = out.groupBy(_._2)
    // exactly one keeper per component
    assert(byCluster.values.forall(_.count(_._3) == 1))
    // a vector is dropped ONLY when its component has another member
    assert(out.filter(!_._3).forall(v => byCluster(v._2).length > 1))
    // some semantic duplicates exist on this fixture (3 multi components)
    assert(byCluster.values.count(_.length > 1) > 0)
  }

  test("batchTopKPruned equals batchTopK; tokenBucket matches the written buckets") {
    val dir = "/root/testdata/sf0.001"
    def rows(name: String) =
      SparkEntry.queries(name)(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(rows("q_sparse_batch_pruned") == rows("q_sparse_batch") &&
      rows("q_sparse_batch").nonEmpty)
    // the driver-side bucket kernel must hash exactly like the written
    // pmod(xxhash64(token), n) column — checked over the real vocabulary
    import graft.sparse.SparseRetrieval
    val postings = SparseRetrieval.buildPostings(SparkEntry.docsWithTokens(spark, dir))
    val engine = postings.select(col("token"),
        pmod(xxhash64(col("token")), lit(64L)).cast("int").as("b"))
      .distinct().collect()
    engine.foreach { r =>
      assert(SparseRetrieval.tokenBucket(r.getString(0), 64) == r.getInt(1),
        s"bucket mismatch for token '${r.getString(0)}'")
    }
  }

  test("assignByJoin equals the inline assign (same argmax, same ties)") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val cents = graft.ann.Ann.seededCentroids(nlist = 8, dim = 64)
    val inline = graft.ann.Ann.assign(emb, cents, roundDp = 6)
      .select(col("vec_id"), col("centroid_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val joined = graft.ann.Ann.assignByJoin(emb, cents, idCol = "vec_id", roundDp = 6)
      .select(col("vec_id"), col("centroid_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(joined == inline && inline.nonEmpty)
    // and semanticDedup's two dispatch branches agree at the boundary
    val a = Dedup.semanticDedup(emb, dim = 64, nlist = 16, threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted.toSeq
    val b = Dedup.semanticDedup(emb, dim = 64, nlist = 17, threshold = 0.45)
    // nlist 16 vs 17 differ in geometry, so only check the join branch RUNS
    // and produces the full corpus with one keeper per component
    val bo = b.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(a.nonEmpty && bo.length == a.length)
    assert(bo.groupBy(_._2).values.forall(_.count(_._3) == 1))
  }

  // ------------------------------------------------ minhash bucket cap

  test("minhashLsh maxBucket drops boilerplate mega-buckets, keeps true near-dups") {
    // 40 docs with disjoint content + a LONG shared footer (footer minima
    // drive some band signatures for every doc → linear-growth buckets),
    // plus one true near-dup pair (docs 100/101 share most content)
    val footer = (0 until 12).map(i => s"footer_$i").mkString(" ")
    val docs = ((0 until 40).map { i =>
      (i.toLong, (0 until 10).map(j => s"u${i}_$j").mkString(" ") + " " + footer)
    } ++ Seq(
      (100L, (0 until 30).map(j => s"shared_$j").mkString(" ") + " tail_a"),
      (101L, (0 until 30).map(j => s"shared_$j").mkString(" ") + " tail_b")))
      .toDF("doc_id", "text")
    val uncapped = Dedup.minhashLsh(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minhashLsh(docs, threshold = 0.5, maxBucket = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the true pair survives the cap (its content buckets are size 2)
    assert(capped.contains((100L, 101L)))
    // capped is a subset of uncapped, same verification semantics
    assert(capped.subsetOf(uncapped))
    // and with the cap above every bucket size, output is identical
    val cappedHigh = Dedup.minhashLsh(docs, threshold = 0.5, maxBucket = Some(1000))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedHigh == uncapped)
  }

  // ------------------------------------------- relational batch hybrid

  test("q_hybrid_batch_rel (one postings join) equals q_hybrid_batch (union of scans)") {
    val dir = "/root/testdata/sf0.001"
    def rows(name: String) =
      SparkEntry.queries(name)(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val rel = rows("q_hybrid_batch_rel")
    val union = rows("q_hybrid_batch")
    assert(rel == union && rel.nonEmpty)
  }

  // ------------------------------------------------ model registry seams

  /** Distinguishable fake: every surface returns values the hash stand-in
    * never produces, so an assertion failure localizes the unswapped seam. */
  private object FakeClient extends ModelClient {
    def embedDense(text: String, dim: Int): Array[Float] = {
      val v = new Array[Float](dim); v(0) = 1f; v
    }
    def encodeSparse(text: String): Map[String, Float] = Map("fake" -> 1f)
    def embedMultimodal(text: String, imageB64: String, dim: Int): Array[Float] = {
      val v = new Array[Float](dim); v(dim - 1) = 1f; v
    }
    def similarity(query: String, passage: String, dim: Int): Float = 0.25f
    def spanScore(query: String, window: String, dim: Int): Double =
      1.0 / (1 + window.length)
  }

  test("ModelRegistry.withClient swaps every inference seam at once") {
    import graft.ingest.Enrich
    import graft.exec.NeuralQuery
    import graft.post.{Highlight, Rerank}
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    ModelRegistry.withClient(FakeClient) {
      // ingest dense: every embedding is the fake basis vector
      val emb = Enrich.textEmbedding(docs, Map("text" -> "emb"), dim = 8)
        .select(col("emb")).collect().map(_.getSeq[Float](0))
      assert(emb.forall(v => v.head == 1f && v.tail.forall(_ == 0f)))
      // ingest sparse: the fake token map
      val enc = Enrich.sparseEncoding(docs, Map("text" -> "sp"))
        .select(col("sp")).collect().map(_.getMap[String, Float](0))
      assert(enc.forall(_ == Map("fake" -> 1f)))
      // multimodal: the other basis vector
      val mm = Enrich.embedMultimodalUdf(8)
      val mv = docs.select(mm(col("text"), col("text")).as("v"))
        .head().getSeq[Float](0)
      assert(mv.last == 1f && mv.init.forall(_ == 0f))
      // query-side dense: query embeds to e0, so score = v[0]/|v| of the
      // fake doc embeddings = 1.0 for every doc
      val scored = NeuralQuery.topK(
        NeuralQuery.scoreByText(docs, "anything", "text", dim = 8), 2)
        .select(col("score")).collect().map(_.getDouble(0))
      assert(scored.toSeq == Seq(1.0, 1.0))
      // cross-encoder rerank: every score is the fake constant
      val rr = Rerank.mlRerank(docs.withColumn("score", lit(0.9)), "q", "text")
        .select(col("score")).collect().map(_.getDouble(0))
      assert(rr.forall(_ == 0.25))
      // QA head: fake spanScore prefers the SHORTEST window — here the
      // 4-char token "beta", which the similarity stand-in never picks
      val sp = Highlight.answerSpan("q", "alpha beta gamma").get
      assert("alpha beta gamma".substring(sp._2, sp._3) == "beta")
      // batch highlight path rides the same registry default
      val hb = Highlight.highlightBatch(docs, "alpha", "text")
        .select(col("highlights")).collect().map(_.getString(0))
      // fake sentence scores are constant per sentence -> all selected
      assert(hb.forall(h => h.contains("<em>")))
    }
    // restored: default hash client again
    assert(ModelRegistry.current == HashModelClient)
    val restored = Enrich.textEmbedding(docs, Map("text" -> "emb"), dim = 8)
      .select(col("emb")).head().getSeq[Float](0)
    assert(restored != Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f))
  }

  test("ngramProbe counts the uncapped join's candidate volume exactly") {
    // sharedDocs: 10 groups × 38 distinct shingles, df=6 each:
    // joinWork = 380 · C(6,2) = 5700; postings = 380 · 6 = 2280
    val p = Dedup.ngramProbe(sharedDocs, "text", "doc_id", n = 3, cap = 100)
    assert(p.nDocs == 60 && p.postings == 2280 && p.joinWork == 5700 &&
      p.hotJoinWork == 0 && p.hotPostings == 0 && p.maxDf == 6)
  }
}
