package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TrainingData

class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  test("stratifiedSample is deterministic and quota-monotone") {
    val df = (0L until 400L).map(i => (i, s"doc $i", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val a = TrainingData.stratifiedSample(df, "lang", Map("en" -> 512, "de" -> 256))
      .select("doc_id").as[Long].collect().sorted
    val b = TrainingData.stratifiedSample(df, "lang", Map("en" -> 512, "de" -> 256))
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b), "same spec must select the same docs")
    // halving a quota can only shrink the stratum, and the kept set nests
    val half = TrainingData.stratifiedSample(df, "lang", Map("en" -> 256, "de" -> 256))
      .select("doc_id").as[Long].collect().toSet
    val full = a.toSet
    assert(half.subsetOf(full))
    // rough rate sanity: 512/1024 of the 200 en docs ≈ half
    assert(full.count(_ % 2 == 0) > 60 && full.count(_ % 2 == 0) < 140)
  }

  test("stratifiedSample: absent stratum falls to defaultQuota") {
    val df = docs((1L, "a", "xx"), (2L, "b", "en"))
    val none = TrainingData.stratifiedSample(df, "lang", Map("en" -> 1024))
    assert(none.select("doc_id").as[Long].collect().toSet == Set(2L))
    val all = TrainingData.stratifiedSample(df, "lang", Map("en" -> 1024), defaultQuota = 1024)
    assert(all.count() == 2)
  }

  test("packGreedy respects the budget and resets per shard") {
    val df = (0L until 64L).map(i => (i, Seq.fill(((i % 7) + 1).toInt)("w").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val packed = TrainingData.packGreedy(df, tokenBudget = 10, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(packed.length == 64)
    // every (shard, pack) group's token sum fits the budget (no doc here
    // exceeds it alone)
    packed.groupBy(p => (p._2, p._3)).foreach { case (_, g) =>
      assert(g.map(_._4).sum <= 10, s"overfull pack: ${g.mkString(",")}")
    }
    // within a shard, pack ids are contiguous from 0 in doc_id order
    packed.groupBy(_._2).foreach { case (_, g) =>
      val packs = g.sortBy(_._1).map(_._3)
      assert(packs.head == 0)
      packs.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(1) == w(0) || w(1) == w(0) + 1)
      }
    }
  }

  test("packGreedy: over-budget doc occupies a pack alone; parallelism-invariant") {
    val df = docs(
      (0L, "a b c", "en"), (4L, Seq.fill(20)("w").mkString(" "), "en"), (8L, "x y", "en"))
    val out = TrainingData.packGreedy(df, tokenBudget = 5, nShards = 4)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
    // all three land in shard 0; the 20-token doc bursts into its own pack
    assert(out.toSeq == Seq((0L, 0, 3), (4L, 1, 20), (8L, 2, 2)))
    val repart = TrainingData.packGreedy(df.repartition(7), tokenBudget = 5, nShards = 4)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
    assert(repart.toSeq == out.toSeq)
  }

  test("repetition fractions: hand-computed doc and degenerate lengths") {
    val df = Seq(
      (1L, "a a b a"),        // uni: a=3/4; bigrams: "a a"(1,wait) -> see below
      (2L, "x y x y x y"),    // uni 3/6; bigram "x y"=3 of 5; trigrams "x y x"=2,"y x y"=2 -> dup 4/4
      (3L, "solo"),           // 1 token: bigram/trigram 0.0
      (4L, "")                // empty: all 0.0
    ).toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.repetition(df).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(2L) == ((0.5, 0.6, 1.0)))
    assert(out(3L) == ((1.0, 0.0, 0.0)))
    assert(out(4L) == ((0.0, 0.0, 0.0)))
    // doc 1: unigrams a,a,b,a -> top 3/4; bigrams "a a","a b","b a" -> top 1/3;
    // trigrams "a a b","a b a" -> no repeats
    assert(out(1L) == ((0.75, 0.333333, 0.0)))
  }

  test("degenerate inputs: empty bench, empty corpus, null text") {
    val empty = docs()
    val corpus = docs((1L, "some words here", "en"))
    // empty bench -> no flags; empty train -> no flags
    assert(Dedup.decontaminate(corpus, empty).count() == 0)
    assert(Dedup.decontaminate(empty, corpus).count() == 0)
    // packGreedy on empty input and on null text (0 tokens)
    assert(TrainingData.packGreedy(empty, 10).count() == 0)
    val withNull = Seq((0L, null.asInstanceOf[String], "en"), (4L, "a b", "en"))
      .toDF("doc_id", "text", "lang")
    val packed = TrainingData.packGreedy(withNull, 10)
      .collect().map(r => (r.getLong(0), r.getInt(3))).toMap
    assert(packed == Map(0L -> 0, 4L -> 2))
    // repetition on null text = all zeros
    val rep = graft.text.TextAnalysis.repetition(withNull)
      .where($"doc_id" === 0L).collect().head
    assert(rep.getDouble(1) == 0.0 && rep.getDouble(2) == 0.0 && rep.getDouble(3) == 0.0)
    // keepCanonical on empty labels
    assert(Dedup.keepCanonical(empty.select($"doc_id".as("id"), $"doc_id".as("cluster_id")),
      corpus.withColumn("n_chars", length($"text"))).count() == 0)
  }

  test("keepCanonical keeps the longest doc per cluster, ties to lowest id") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L))
      .toDF("id", "cluster_id")
    val docs = Seq((1L, 50), (2L, 80), (3L, 80), (7L, 10))
      .toDF("doc_id", "n_chars")
    val out = Dedup.keepCanonical(labels, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // 2 and 3 tie on length; 2 wins on id. singleton 7 keeps itself
    assert(out == Set((1L, 1L, false), (2L, 1L, true), (3L, 1L, false), (7L, 7L, true)))
  }

  test("streaming decontamination equals the batch bipartite relation") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val bench = docs(
      (10L, "the quick brown fox jumps over the lazy dog", "en"),
      (11L, "unrelated benchmark text with no overlap", "en"))
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = graft.streaming.StreamingDecontaminate
      .flagStream(stream, bench, threshold = 0.4)
      .writeStream.format("memory").queryName("decon_stream").outputMode("complete").start()
    mem.addData(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different words entirely here now"),
      (3L, "the quick brown fox jumps over a lazy dog"))
    q.processAllAvailable()
    val streamed = spark.table("decon_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    val batch = Dedup.decontaminate(
      docs((1L, "the quick brown fox jumps over the lazy dog", "en"),
        (2L, "completely different words entirely here now", "en"),
        (3L, "the quick brown fox jumps over a lazy dog", "en")),
      bench, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("decontaminate flags only cross-corpus pairs and matches self-join semantics") {
    val train = docs(
      (1L, "the quick brown fox jumps over the lazy dog", "en"),
      (2L, "completely different words entirely here now", "en"),
      (3L, "the quick brown fox jumps over a lazy dog", "en")) // near-dup of bench 10
    val bench = docs(
      (10L, "the quick brown fox jumps over the lazy dog", "en"),
      (11L, "unrelated benchmark text with no overlap", "en"))
    val out = Dedup.decontaminate(train, bench, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // 1 is an exact copy of 10; 3 is a near-dup of 10; train-train pair
    // (1,3) must NOT appear
    assert(out.toSet == Set((1L, 10L), (3L, 10L)))
    // jaccard for the exact copy is 1.0
    val exact = Dedup.decontaminate(train, bench, threshold = 0.4)
      .where($"train_id" === 1L).select("jaccard").as[Double].head()
    assert(exact == 1.0)
  }
}
