package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TrainingData

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en") }.toDF("doc_id", "text", "lang")

  // -------------------------------------------------- winnowing kernel

  test("winnowFingerprints: degenerate inputs") {
    assert(Dedup.winnowFingerprints("", 4, 4).isEmpty)
    assert(Dedup.winnowFingerprints(null, 4, 4).isEmpty)
    assert(Dedup.winnowFingerprints("a b c", 4, 4).isEmpty, "< k tokens has no grams")
    // exactly k tokens -> one gram, one (truncated) window, one fingerprint
    val one = Dedup.winnowFingerprints("a b c d", 4, 4)
    assert(one.length == 1 && one.head._1 == 1)
  }

  test("winnowFingerprints: fewer grams than w winnows one truncated window") {
    // 6 tokens, k=4 -> 3 grams, w=4 -> single window over all 3
    val fps = Dedup.winnowFingerprints("a b c d e f", 4, 4)
    assert(fps.length == 1)
    // the selected gram must be one of the 3, and equal the global min
    // (rightmost on ties)
    val all = (1 to 3).map { i =>
      val sub = Seq("a", "b", "c", "d", "e", "f").slice(i - 1, i + 3).mkString(" ")
      (i, Dedup.winnowFingerprints(sub, 4, 4).head._2)
    }
    val minH = all.map(_._2).min
    val expectPos = all.filter(_._2 == minH).map(_._1).max
    assert(fps.head == ((expectPos, minH)))
  }

  test("winnowFingerprints: rightmost tie-break on constant text") {
    // every gram hash is identical -> each window selects its LAST position
    val fps = Dedup.winnowFingerprints(Seq.fill(12)("x").mkString(" "), 4, 4)
    val n = 12 - 4 + 1 // 9 grams
    val starts = n - 4 + 1 // 6 windows
    // window j (1-based) selects position j+w-1
    assert(fps.map(_._1).sorted == (4 to starts + 3).toSeq)
  }

  test("winnowing guarantee: a shared run of w+k-1 tokens shares a fingerprint") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    def words(m: Int) = Seq.fill(m)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    // 200 random trials: two otherwise-random docs share a 7-token run
    (1 to 200).foreach { _ =>
      val shared = words(4 + 4 - 1)
      val a = s"${words(10)} $shared ${words(10)}"
      val b = s"${words(10)} $shared ${words(10)}"
      val fa = Dedup.winnowFingerprints(a, 4, 4).map(_._2).toSet
      val fb = Dedup.winnowFingerprints(b, 4, 4).map(_._2).toSet
      assert(fa.intersect(fb).nonEmpty,
        s"docs sharing a ${4 + 4 - 1}-token run must share a fingerprint:\n$a\n$b")
    }
  }

  test("winnowing density: selection is sparse but covers every window") {
    val rnd = new scala.util.Random(13)
    val text = Seq.fill(500)(s"t${rnd.nextInt(5000)}").mkString(" ")
    val k = 4; val w = 8
    val fps = Dedup.winnowFingerprints(text, k, w)
    val nGrams = 500 - k + 1
    // expected density 2/(w+1) ~ 0.22; allow generous slack either side
    assert(fps.length > nGrams / (w + 1) / 2, "far below theoretical density")
    assert(fps.length < nGrams / 2, "selection must be sparse vs all grams")
    // positions must be a subset of gram positions
    assert(fps.forall(f => f._1 >= 1 && f._1 <= nGrams))
  }

  test("operators tolerate empty and token-less corpora") {
    import graft.text.{TextAnalysis, TrainingData}
    val empty = docs()
    assert(Dedup.winnowPairs(empty).count() == 0)
    assert(Dedup.winnowPairExtent(empty).count() == 0)
    assert(Dedup.winnowExcise(empty).count() == 0)
    assert(TextAnalysis.gopherFilter(empty).count() == 0)
    assert(TextAnalysis.vocab(empty).count() == 0)
    val blank = docs((1L, ""), (2L, "   "), (3L, "x"))
    assert(Dedup.winnowPairs(blank).count() == 0, "no k-grams, no pairs")
    val f = TextAnalysis.gopherFilter(blank).select("doc_id", "reason")
      .as[(Long, String)].collect().toMap
    assert(f(1L) == "too_short" && f(2L) == "too_short" && f(3L) == "too_short")
    // temperature mixing over a single stratum keeps ~targetFrac
    val one = (0L until 200L).map(i => (i, s"d $i", "en", "only"))
      .toDF("doc_id", "text", "lang", "source")
    val kept = TrainingData.temperatureMix(one, "source", 0.5, 0.5).count()
    assert(kept > 60 && kept < 140)
  }

  // -------------------------------------------------- pair operator

  test("winnowPairs finds a planted copied passage and orders ids") {
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = docs(
      (1L, s"one two three four five six $passage seven eight nine ten"),
      (2L, s"uno dos tres cuatro cinco seis $passage siete ocho nueve"),
      (3L, "totally unrelated text with completely different tokens here"))
    val out = Dedup.winnowPairs(df, k = 4, w = 4, minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 2L)))
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("winnowPairs maxDf drops corpus-hot fingerprints from candidates") {
    val boiler = "standard footer text appears on every single page here"
    val df = docs((1L to 6L).map(i => (i, s"unique$i content$i $boiler")): _*)
    val uncapped = Dedup.winnowPairs(df, k = 4, w = 4, minShared = 1).count()
    assert(uncapped == 15, "all C(6,2) pairs share the boilerplate fingerprints")
    val capped = Dedup.winnowPairs(df, k = 4, w = 4, minShared = 1, maxDf = Some(3))
    assert(capped.count() == 0, "df-6 fingerprints are dropped by the cap")
  }

  test("winnowPairs n_shared counts distinct shared hashes") {
    val df = docs(
      (1L, "p q r s t u v w x y z aa bb cc dd"),
      (2L, "p q r s t u v w x y z aa bb cc dd"))
    val expected = Dedup.winnowFingerprints("p q r s t u v w x y z aa bb cc dd", 4, 4)
      .map(_._2).distinct.size
    val row = Dedup.winnowPairs(df, k = 4, w = 4, minShared = 1)
      .select("id_a", "id_b", "n_shared").as[(Long, Long, Long)].head()
    assert(row == ((1L, 2L, expected.toLong)))
  }

  test("longestCommonRun: DP kernel ground truths") {
    import Dedup.longestCommonRun
    def lcr(a: String, b: String) =
      longestCommonRun(a.split(" ").filter(_.nonEmpty), b.split(" ").filter(_.nonEmpty))
    assert(lcr("a b c d e", "x b c d y") == 3)
    assert(lcr("a b c", "a b c") == 3)
    assert(lcr("a b c", "x y z") == 0)
    assert(lcr("", "a b") == 0)
    // repeated tokens: best run spans the repetition
    assert(lcr("a a a b", "z a a a q") == 3)
    // two disjoint shared runs -> the longer wins
    assert(lcr("p q r s t u m n", "p q x s t u v w") == 3)
  }

  test("winnowPairExtent reports the planted passage length") {
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa" // 10 tokens
    val df = docs(
      (1L, s"one two three four five six $passage seven eight nine ten"),
      (2L, s"uno dos tres cuatro cinco seis $passage siete ocho nueve"))
    val row = Dedup.winnowPairExtent(df, k = 4, w = 4, minShared = 1)
      .select("id_a", "id_b", "max_run").as[(Long, Long, Int)].head()
    assert(row._1 == 1L && row._2 == 2L)
    assert(row._3 == 10, s"expected the 10-token passage, got run ${row._3}")
  }

  test("winnowExcise removes the best shared run from the higher-id doc") {
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = docs(
      (1L, s"one two three four five six $passage seven eight nine ten"),
      (2L, s"uno dos tres cuatro cinco seis $passage siete ocho nueve"))
    val row = Dedup.winnowExcise(df, k = 4, w = 4, minShared = 1)
      .select("id_a", "id_b", "run_len", "text_b_clean")
      .as[(Long, Long, Int, String)].head()
    assert(row._1 == 1L && row._2 == 2L && row._3 == 10)
    assert(row._4 == "uno dos tres cuatro cinco seis siete ocho nueve",
      s"excised text wrong: '${row._4}'")
    // identical docs: the whole of doc B is one shared run -> empty clean text
    val dup = docs((1L, passage), (2L, passage))
    val r2 = Dedup.winnowExcise(dup, k = 4, w = 4, minShared = 1)
      .select("run_len", "text_b_clean").as[(Int, String)].head()
    assert(r2 == ((10, "")))
  }

  test("decontaminateWinnow catches a quoted benchmark passage Jaccard dilutes") {
    val benchQ = "what is the capital of france paris is the capital"
    val rnd = new scala.util.Random(3)
    val filler = Seq.fill(200)(s"w${rnd.nextInt(10000)}").mkString(" ")
    val train = docs(
      (1L, s"$filler $benchQ $filler"), // long doc quoting the bench passage
      (2L, filler))
    val bench = docs((100L, benchQ))
    // whole-doc Jaccard dilutes: |shared shingles| / |union| is tiny
    val jac = Dedup.decontaminate(train, bench, threshold = 0.4)
    assert(jac.count() == 0, "Jaccard decontamination misses the quoted passage")
    // winnow fingerprints are LOCAL: the shared run is caught regardless of
    // surrounding length
    val wn = Dedup.decontaminateWinnow(train, bench, minShared = 1)
      .select("train_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(wn.contains((1L, 100L)))
    assert(!wn.exists(_._1 == 2L))
  }

  test("gopherFilter fires each rule in first-fail order") {
    import graft.text.TextAnalysis
    val df = docs(
      (1L, "too short"),                                           // too_short
      (2L, Seq.fill(120)("w").mkString(" ")),                      // too_long (n=120; unigram frac 1.0 shadowed)
      (3L, (1 to 30).map(i => s"verylongword$i").mkString(" ")),   // word_len (mwl > 5)
      (4L, (("spam " * 10) + (1 to 40).map(i => s"u$i").mkString(" ")).trim), // repetitive_unigram (10/50 = 0.2)
      (5L, ((1 to 25).map(i => s"a$i b$i").mkString(" ")) + " " + ("x y " * 5).trim), // repetitive_bigram? check
      (6L, (1 to 60).map(i => s"ok$i").mkString(" ")))             // ok (distinct short words)
    val out = TextAnalysis.gopherFilter(df)
      .select("doc_id", "kept", "reason").as[(Long, Boolean, String)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((false, "too_short")))
    assert(out(2L) == ((false, "too_long")))
    assert(out(3L) == ((false, "word_len")))
    assert(out(4L) == ((false, "repetitive_unigram")))
    assert(out(6L) == ((true, "ok")))
    // first-fail shadowing: doc 2 is ALSO maximally repetitive, but the
    // length rule fires first
    assert(out(2L)._2 != "repetitive_unigram")
  }

  test("flagStreamWinnow equals the batch winnow decontamination relation") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val passage = "what is the capital of france paris is the capital"
    val bench = docs((100L, passage))
    val trainRows = Seq(
      (1L, s"x1 x2 x3 x4 x5 x6 $passage y1 y2 y3"),
      (2L, "completely different words entirely here now present today"))
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = graft.streaming.StreamingDecontaminate
      .flagStreamWinnow(stream, bench, minShared = 1)
      .writeStream.format("memory").queryName("winnow_stream").outputMode("complete").start()
    mem.addData(trainRows: _*)
    q.processAllAvailable()
    val streamed = spark.table("winnow_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    val batch = Dedup.decontaminateWinnow(docs(trainRows: _*), bench, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    assert(streamed.forall(_._1 == 1L), "only the quoting doc is flagged")
  }

  test("corpusStats interpolates percentiles the quantile_cont way") {
    import graft.text.TextAnalysis
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "a", 40L))
      .toDF("doc_id", "source", "n_chars")
    val r = TextAnalysis.corpusStats(df)
      .select("n_docs", "mean_chars", "p50_chars", "p95_chars")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 == 4L && r._2 == 25.0)
    assert(r._3 == 25.0, "p50 of [10,20,30,40] interpolates to 25")
    // h = (n-1)p = 2.85 -> 30 + 0.85*(40-30) = 38.5
    assert(r._4 == 38.5, s"p95 must interpolate: got ${r._4}")
  }

  // -------------------------------------------------- embedding outliers

  test("embeddingOutliers flags a planted opposite vector; centroid is partition-invariant") {
    import graft.text.TrainingData
    val dim = 8
    val base = Array.tabulate(dim)(i => 0.5f + 0.01f * i)
    val rows = (0L until 20L).map { i =>
      (i, base.map(v => v + (i % 3) * 0.001f).toSeq, 1)
    } :+ ((99L, base.map(v => -v).toSeq, 1)) // the planted outlier
    val df = rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = TrainingData.embeddingOutliers(df, threshold = 0.0)
      .select("vec_id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(out(99L), "opposite vector must flag as outlier")
    assert((0L until 20L).forall(i => !out(i)), "cluster members must not flag")
    // quantized-long centroid: identical scores under any partitioning
    val a = TrainingData.embeddingOutliers(df.repartition(2), threshold = 0.0)
      .select("vec_id", "centroid_cos").as[(Long, Double)].collect().toMap
    val b = TrainingData.embeddingOutliers(df.repartition(7), threshold = 0.0)
      .select("vec_id", "centroid_cos").as[(Long, Double)].collect().toMap
    assert(a == b, "centroid cosine must be aggregation-order invariant")
  }

  // -------------------------------------------------- temperature mixing

  test("temperatureQuotas: alpha=1 reproduces natural proportions") {
    val q = TrainingData.temperatureQuotas(Map("a" -> 100L, "b" -> 900L), 1.0, 0.5)
    // p_s = targetFrac for every stratum -> quota = floor(0.5 * 1024)
    assert(q("a") == 512 && q("b") == 512)
  }

  test("temperatureQuotas: alpha=0 equalizes expected stratum counts") {
    // strata big enough that the per-stratum cap never binds (the equal
    // target is 375 docs each)
    val counts = Map("a" -> 600L, "b" -> 900L)
    val q = TrainingData.temperatureQuotas(counts, 0.0, 0.5)
    val ea = q("a") / 1024.0 * 600
    val eb = q("b") / 1024.0 * 900
    assert(math.abs(ea - eb) < 2.0, s"expected counts diverge: $ea vs $eb")
    // and when a stratum CANNOT supply its equal share, it clamps to 1024
    val clamped = TrainingData.temperatureQuotas(Map("a" -> 100L, "b" -> 900L), 0.0, 0.5)
    assert(clamped("a") == TrainingData.SampleMod)
  }

  test("temperatureQuotas: alpha<1 up-samples the tail, caps at 1") {
    val counts = Map("big" -> 10000L, "small" -> 10L)
    val q = TrainingData.temperatureQuotas(counts, 0.5, 0.5)
    // keep PROBABILITY for the small stratum must exceed the big one
    assert(q("small") > q("big"))
    // a tiny stratum under heavy up-sampling clamps at SampleMod
    val q2 = TrainingData.temperatureQuotas(Map("big" -> 1000000L, "tiny" -> 2L), 0.25, 0.9)
    assert(q2("tiny") == TrainingData.SampleMod)
    assert(q.values.forall(v => v >= 0 && v <= TrainingData.SampleMod))
  }

  test("assignSplits partitions every doc deterministically at ~922/51/51") {
    import graft.text.TrainingData
    val df = (0L until 2000L).map(i => (i, s"d $i", "en")).toDF("doc_id", "text", "lang")
    val a = TrainingData.assignSplits(df).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val b = TrainingData.assignSplits(df).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(a == b, "split must be reproducible")
    val byS = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byS.keySet == Set("train", "val", "test"))
    assert(byS("train") > 1700 && byS("train") < 1890, s"train ${byS("train")}")
    assert(byS("val") > 50 && byS("val") < 160)
    // the split salt is independent of the sampling salt: membership in a
    // stratified SAMPLE does not correlate with the split assignment
    assert(TrainingData.assignSplits(df, salt = "doc:")
      .select("split").as[String].collect().toSet == Set("train", "val", "test"))
  }

  test("commonness ranks boilerplate above rare-token docs") {
    import graft.text.TextAnalysis
    val df = docs(
      (1L, "common common common common words words here here"),
      (2L, "zyx9 qwv8 unique7 rare6 single5 once4 solo3 lone2"))
    val m = TextAnalysis.commonness(df)
      .select("doc_id", "mean_token_freq").as[(Long, Double)].collect().toMap
    assert(m(1L) > m(2L), s"boilerplate doc must score higher: $m")
    // every token in doc 2 is unique -> mean freq = 1/total
    assert(m(2L) == BigDecimal(1.0 / 16).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("temperatureMix keeps ~targetFrac of the corpus and nests determinism") {
    val df = (0L until 1000L)
      .map(i => (i, s"doc $i", "en", s"src${i % 4}"))
      .toDF("doc_id", "text", "lang", "source")
    val a = TrainingData.temperatureMix(df, "source", 0.5, 0.25)
      .select("doc_id").as[Long].collect().sorted
    val b = TrainingData.temperatureMix(df, "source", 0.5, 0.25)
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b), "mix must be reproducible")
    // equal strata -> alpha irrelevant; keep rate ~25%
    assert(a.length > 180 && a.length < 320, s"kept ${a.length} of 1000")
  }
}
