package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.exec.{Explain, HybridPipeline, NeuralQuery}
import graft.ingest.Enrich
import graft.ml.HashEmbedder
import graft.model._
import graft.post.Highlight
import graft.streaming.StreamingEnrich

class HighlightSpec extends SparkSpec {
  test("highlights exactly the argmax-similarity sentence") {
    val doc = "spark joins tables fast. bananas are yellow fruit. nothing else here."
    val q = "spark join table"
    val sents = Highlight.segmentSentences(doc).map(sp => doc.substring(sp.start, sp.end))
    val best = sents.maxBy(s => graft.ml.HashEmbedder.similarity(q, s))
    val out = Highlight.highlightText(q, doc)
    assert(out.contains(s"<em>$best</em>"))
    // non-best sentences below threshold must not be wrapped
    sents.filterNot(_ == best).foreach { s0 =>
      if (graft.ml.HashEmbedder.similarity(q, s0) <
          graft.ml.HashEmbedder.similarity(q, best) * 0.999)
        assert(!out.contains(s"<em>$s0</em>"))
    }
  }

  test("segmentation offsets index the original text exactly") {
    val doc = "First one.  Second?\n\nThird thing!   tail with no punct"
    val spans = Highlight.segmentSentences(doc)
    assert(spans.map(sp => doc.substring(sp.start, sp.end)) ==
      Seq("First one.", "Second?", "Third thing!", "tail with no punct"))
    assert(spans.map(_.ord) == Seq(1, 2, 3, 4))
    // sentences never start/end inside the separator whitespace
    spans.foreach { sp =>
      assert(!doc.charAt(sp.start).isWhitespace)
      assert(!doc.charAt(sp.end - 1).isWhitespace)
    }
  }

  test("tagging preserves original whitespace outside and between spans") {
    // reference HighlightTagApplier splices tags into the ORIGINAL context;
    // the double space and newlines must survive untouched
    val doc = "spark joins tables fast.  \n\nbananas are yellow fruit."
    val q = "spark join table"
    val spans = Highlight.segmentSentences(doc)
    val scores = Highlight.scoreSentences(q, doc, spans)
    val best = scores.max
    val expected = Highlight.applyTags(doc,
      spans.zip(scores).collect { case (sp, sc) if sc >= best * 0.999 => (sp.start, sp.end) })
    val out = Highlight.highlightText(q, doc)
    assert(out == expected)
    // whichever sentence won, the separator whitespace survives verbatim
    assert(out.replace("<em>", "").replace("</em>", "") == doc)
    assert(out.contains("<em>"))
  }

  test("applyTags validation matches HighlightTagApplier error contract") {
    val text = "0123456789"
    // out of bounds / inverted
    intercept[IllegalArgumentException](Highlight.applyTags(text, Seq((-1, 3))))
    intercept[IllegalArgumentException](Highlight.applyTags(text, Seq((2, 11))))
    intercept[IllegalArgumentException](Highlight.applyTags(text, Seq((5, 5))))
    // unsorted, duplicate start, overlapping
    intercept[IllegalArgumentException](Highlight.applyTags(text, Seq((5, 7), (1, 3))))
    intercept[IllegalArgumentException](Highlight.applyTags(text, Seq((2, 4), (2, 6))))
    intercept[IllegalArgumentException](Highlight.applyTags(text, Seq((2, 6), (4, 8))))
    // empty list → text unchanged; adjacent spans OK
    assert(Highlight.applyTags(text, Nil) == text)
    assert(Highlight.applyTags(text, Seq((0, 2), (2, 4))) == "<em>01</em><em>23</em>456789")
  }

  test("segmentation invariants hold on fuzzed texts (spans ordered, in-bounds, reconstruction exact)") {
    val rnd = new scala.util.Random(7L)
    val alphabet = "ab .!?\n\t  e".toCharArray
    (1 to 300).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val spans = Highlight.segmentSentences(text)
      // ordered, non-overlapping, in-bounds, non-empty
      spans.sliding(2).foreach {
        case Seq(a, b) => assert(a.end <= b.start, s"overlap in '$text'")
        case _ =>
      }
      spans.foreach { sp =>
        assert(sp.start >= 0 && sp.end <= text.length && sp.start < sp.end, s"bounds in '$text'")
      }
      // tagging any subset of spans then stripping tags reproduces the text
      val selected = spans.filter(_ => rnd.nextBoolean()).map(sp => (sp.start, sp.end))
      val tagged = Highlight.applyTags(text, selected)
      assert(tagged.replace("<em>", "").replace("</em>", "") == text, s"reconstruction of '$text'")
    }
  }

  test("batch highlighting equals the single-inference path at any sub-batch size") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark joins tables fast. bananas are yellow."),
      (2L, "nothing relevant here at all. still nothing."),
      (3L, "fast table scan with spark join engine"),
      (4L, "one. two. three. four. five."),
      (5L, "spark")
    ).toDF("doc_id", "text")
    val q = "spark join table"
    val single = Highlight.highlight(df, q, "text")
      .select("doc_id", "highlights").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (bs <- Seq(1, 2, 100)) {
      val batch = Highlight.highlightBatch(df, q, "text", maxInferenceBatchSize = bs)
        .select("doc_id", "highlights").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(batch == single, s"batch size $bs diverged")
    }
  }
  test("extractQueryText walks the subquery tree like QueryTextExtractorRegistry") {
    val subs = Seq(
      SubquerySpec("neural", "emb", queryText = Some("vector question")),
      SubquerySpec("term", "text", queryText = Some("exact")),
      SubquerySpec("term", "other_field", queryText = Some("offfield")),
      SubquerySpec("range", "price"),
      SubquerySpec("neural_sparse", "tokens", queryText = Some("vector question")) // dup → deduped
    )
    assert(Highlight.extractQueryText(subs, "text") == "vector question exact")
    // term on a non-highlighted field contributes nothing
    assert(!Highlight.extractQueryText(subs, "text").contains("offfield"))
  }

  test("no sentence punctuation → whole text is one sentence") {
    val out = Highlight.highlightText("spark", "spark fast engine")
    assert(out == "<em>spark fast engine</em>")
  }
  test("zero-similarity doc unchanged") {
    assert(Highlight.highlightText("xyz", "abc def") == "abc def")
  }
}

class NeuralQuerySpec extends SparkSpec {
  import spark.implicits._

  test("scoreByText + topK orders by cosine to the query embedding") {
    val df = Seq((1L, "spark join table"), (2L, "unrelated words entirely"), (3L, "spark join"))
      .toDF("doc_id", "text")
    val out = NeuralQuery.topK(
      NeuralQuery.scoreByText(df, "spark join table", "text").select($"doc_id", $"score"), 3)
      .collect()
    assert(out(0).getLong(0) == 1L)
    assert(math.abs(out(0).getDouble(1) - 1.0) < 1e-4)
  }

  test("chunkedMaxScore takes max over chunk embeddings (ScoreMode.Max)") {
    val df = Seq((1L, ("spark join table " * 8).trim)).toDF("doc_id", "body")
    val enriched = Enrich.semanticField(df, "body", chunked = true, tokenLimit = 6)
    val out = NeuralQuery.chunkedMaxScore(enriched, "spark join table", "body_semantic_info.chunks")
      .collect()(0)
    // every chunk is a repetition of the query tokens → max cosine ≈ 1
    assert(math.abs(out.getDouble(1) - 1.0) < 1e-4)
  }

  test("radial keeps only docs above min_score") {
    val df = Seq((1L, "spark join table"), (2L, "zzz yyy xxx")).toDF("doc_id", "text")
    val out = NeuralQuery.radial(
      NeuralQuery.scoreByText(df, "spark join table", "text"), 0.9).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
  }
}

class RequestProcessorSpec extends SparkSpec {
  test("enricher fills missing model ids with field default then global default") {
    val subs = Seq(
      SubquerySpec("neural", "title"),
      SubquerySpec("neural_sparse", "body", modelId = Some("explicit")),
      SubquerySpec("match", "body"))
    val out = NeuralQueryEnricher.enrich(subs, Some("global"), Map("title" -> "per-field"))
    assert(out(0).modelId.contains("per-field"))
    assert(out(1).modelId.contains("explicit"))
    assert(out(2).modelId.isEmpty) // lexical queries untouched
  }

  test("rule-based agentic translator: quoted phrases + neural remainder") {
    val subs = RuleBasedTranslator.translate("find \"exact phrase\" about spark", Seq("text"))
    assert(subs.exists(s => s.kind == "match" && s.queryText.contains("exact phrase")))
    assert(subs.exists(_.kind == "neural"))
    assert(subs.exists(_.kind == "neural_sparse"))
    assert(subs.size <= HybridLimits.MaxSubqueries)
  }

  test("schema-aware translator extracts range/term filters and respects the cap") {
    val schema = TranslatorSchema(Seq("text"),
      langField = Some("lang"), charCountField = Some("n_chars"))
    val subs = RuleBasedTranslator.translateWithSchema(
      "docs \"fast scan\" in French over 200 chars about joins", schema)
    assert(subs.exists(s => s.kind == "range" && s.field == "n_chars"
      && s.queryText.contains("200..")))
    assert(subs.exists(s => s.kind == "term" && s.field == "lang"
      && s.queryText.contains("fr")))
    assert(subs.exists(s => s.kind == "match" && s.queryText.contains("fast scan")))
    // remainder excludes the consumed spans
    val neural = subs.find(_.kind == "neural").get.queryText.get
    assert(!neural.contains("French") && !neural.contains("200") && neural.contains("joins"))
    assert(subs.size <= HybridLimits.MaxSubqueries)

    // under N chars → open lower bound; without schema hints no filters emit
    val under = RuleBasedTranslator.translateWithSchema("notes under 50 chars", schema)
    assert(under.exists(s => s.kind == "range" && s.queryText.contains("..50")))
    val bare = RuleBasedTranslator.translate("notes under 50 chars in german", Seq("text"))
    assert(!bare.exists(s => s.kind == "range" || s.kind == "term"))
  }

  test("conversational memory carries prior filters, latest turn binds") {
    val schema = TranslatorSchema(Seq("text"),
      langField = Some("lang"), charCountField = Some("n_chars"))
    val store = new AgentMemoryStore
    val t1 = RuleBasedTranslator.translateWithMemory(
      "find docs about joins in german over 200 chars", schema, "m1", store)
    // first turn behaves exactly like the stateless translation
    assert(t1 == RuleBasedTranslator.translateWithSchema(
      "find docs about joins in german over 200 chars", schema))
    // turn 2: new phrase + lang override; the range filter carries over,
    // the term filter re-binds to the CURRENT turn's value
    val t2 = RuleBasedTranslator.translateWithMemory(
      "\"fast scan\" in french", schema, "m1", store)
    assert(t2.exists(s => s.kind == "range" && s.queryText.contains("200..")))
    assert(t2.exists(s => s.kind == "term" && s.queryText.contains("fr")))
    assert(!t2.exists(s => s.queryText.contains("de")))
    // phrases/semantic clauses never carry over
    assert(!t2.exists(s => s.kind == "neural" && s.queryText.exists(_.contains("joins"))))
    // a different memory id sees none of it
    val other = RuleBasedTranslator.translateWithMemory(
      "\"fast scan\"", schema, "m2", store)
    assert(!other.exists(s => s.kind == "range" || s.kind == "term"))
  }
}

class ExplainSpec extends SparkSpec {
  import spark.implicits._

  test("explain carries raw and normalized per-subquery scores; ranks match plain run") {
    val scored = Seq(
      (0L, 0, 1L, 10.0), (0L, 0, 2L, 5.0), (0L, 1, 1L, 4.0), (0L, 1, 3L, 8.0)
    ).toDF("query_id", "subq", "doc_id", "score")
    val plain = HybridPipeline.run(scored, 2, NormalizationSpec.MinMax(),
      CombinationSpec.ArithmeticMean(), size = 10)
      .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getInt(3))).toMap
    val explained = Explain.runWithExplain(scored, 2, NormalizationSpec.MinMax(),
      CombinationSpec.ArithmeticMean(), size = 10).collect()
    explained.foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      assert(plain(docId)._1 == r.getAs[Double]("score"))
      assert(plain(docId)._2 == r.getAs[Int]("rank"))
      val ex = r.getAs[org.apache.spark.sql.Row]("explain")
      assert(ex.getString(0).contains("min_max"))
      val details = ex.getSeq[org.apache.spark.sql.Row](1)
      assert(details.nonEmpty && details.length <= 2)
      // doc1 is in both subqueries → two fragments with raw scores 10 and 4
      if (docId == 1L) {
        assert(details.map(d => d.getDouble(1)).toSet == Set(10.0, 4.0))
      }
    }
  }
}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("stateless enrichment runs identically on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "text", "source")
    val q = StreamingEnrich.enrich(docs)
      .writeStream.format("memory").queryName("enriched_docs").outputMode("append").start()
    mem.addData((1L, "the cat sat on the mat and it is that", "s1"),
      (2L, "el perro de la casa y que en un dia", "s2"))
    q.processAllAvailable()
    val out = spark.table("enriched_docs").orderBy("doc_id").collect()
    q.stop()
    assert(out.length == 2)
    assert(out(0).getAs[String]("pred_lang") == "en")
    assert(out(1).getAs[String]("pred_lang") == "es")
    assert(out(0).getSeq[Float](out(0).fieldIndex("embedding")).length == 8)
    assert(out(0).getMap[String, Float](out(0).fieldIndex("tokens")).nonEmpty)
  }

  test("windowed counts with watermark aggregate per source") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, java.sql.Timestamp)]
    val docs = mem.toDF().toDF("doc_id", "text", "source", "ts")
    val q = StreamingEnrich.countsPerSourceWindow(docs, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_counts").outputMode("complete").start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:15:00")
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 10:45:00")
    val t2 = java.sql.Timestamp.valueOf("2026-01-01 11:15:00")
    mem.addData((1L, "aaa", "s1", t0), (2L, "bbb", "s1", t1), (3L, "ccc", "s1", t2))
    q.processAllAvailable()
    val out = spark.table("win_counts").collect()
    q.stop()
    assert(out.map(_.getAs[Long]("n_docs")).sum == 3)
    assert(out.length == 2) // two hour windows for s1
  }
}

class StatefulSessionSpec extends SparkSpec {
  import spark.implicits._
  import graft.streaming.StreamingSessionize
  import graft.streaming.StreamingSessionize.Event

  test("mapGroupsWithState sessionization carries state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val q = StreamingSessionize.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode("update").start()
    val h = 3600L * 1000000000L
    // batch 1: user 1 has two events 10 min apart → one session
    mem.addData(Event(1L, 0L), Event(1L, 600L * 1000000000L))
    q.processAllAvailable()
    val b1 = spark.table("sessions").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(b1.contains((1L, 1L, 2L)))
    // batch 2: event 2h later → NEW session; state remembered across batches
    mem.addData(Event(1L, 2 * h))
    q.processAllAvailable()
    val b2 = spark.table("sessions").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    q.stop()
    assert(b2.contains((1L, 2L, 3L)))
  }
}

class StreamingSearchSpec extends SparkSpec {
  import spark.implicits._
  import graft.streaming.StreamingSearch

  test("streamed query batches are served against the static postings index") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "spark join table"), (2L, "fast scan engine"), (3L, "spark spark fast"))
      .toDF("doc_id", "text")
      .withColumn("tokens", graft.ingest.Enrich.encodeUdf(col("text")))
    val postings = graft.sparse.SparseRetrieval.buildPostings(corpus)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Double)]
    val qStream = mem.toDF().toDF("query_id", "token", "qw")
    val q = StreamingSearch.serveSparse(qStream, postings, k = 2).toDF()
      .writeStream.format("memory").queryName("served").outputMode("append").start()
    // batch 1: query 0 = {spark}; batch 2: query 1 = {fast}
    mem.addData((0L, "spark", 1.0))
    q.processAllAvailable()
    mem.addData((1L, "fast", 1.0))
    q.processAllAvailable()
    val out = spark.table("served").collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    q.stop()
    // query 0: doc 3 has spark×2 (higher tf weight), doc 1 spark×1
    assert(out((0L, 1)) == 3L && out((0L, 2)) == 1L)
    // query 1: docs 2 and 3 both contain fast once → tie broken by doc_id
    assert(out((1L, 1)) == 2L && out((1L, 2)) == 3L)
    // batch parity: streamed results equal batchTopK on the same queries
    val batch = graft.sparse.SparseRetrieval.batchTopK(postings,
      Map(0L -> Map("spark" -> 1.0f), 1L -> Map("fast" -> 1.0f)), k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(out == batch)
  }
}

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._
  import graft.streaming.StreamingDedup
  import graft.streaming.StreamingDedup.DocIn

  test("flatMapGroupsWithState dedup flags late duplicates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocIn]
    val q = StreamingDedup.dedupStream(mem.toDS())
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    // batch 1: two distinct docs + one in-batch duplicate of h1
    mem.addData(DocIn(1L, "h1"), DocIn(2L, "h2"), DocIn(3L, "h1"))
    q.processAllAvailable()
    val b1 = spark.table("dedup_out").collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Boolean]("is_duplicate"), r.getAs[Long]("keep_id"))).toMap
    assert(b1(1L) == ((false, 1L)))
    assert(b1(2L) == ((false, 2L)))
    assert(b1(3L) == ((true, 1L))) // in-batch dup, kept id = first seen
    // batch 2: a LATE duplicate of h1 — state must remember keep_id=1
    mem.addData(DocIn(9L, "h1"), DocIn(10L, "h3"))
    q.processAllAvailable()
    val b2 = spark.table("dedup_out").collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Boolean]("is_duplicate"), r.getAs[Long]("keep_id"))).toMap
    q.stop()
    assert(b2(9L) == ((true, 1L)))
    assert(b2(10L) == ((false, 10L)))
  }
}

class FieldMapSpec extends SparkSpec {
  import spark.implicits._
  import graft.ingest.Enrich
  import graft.ml.HashEmbedder

  test("field-map traversal: plain, nested struct path, string list") {
    val df = Seq(
      (1L, "top text", Seq("fav one", "fav two"), ("game txt", "movie txt"))
    ).toDF("doc_id", "title", "favor_list", "favorites")
      .withColumn("favorites", struct($"favorites._1".as("game"), $"favorites._2".as("movie")))
    val out = Enrich.textEmbedding(df, Map(
      "title" -> "title_emb",
      "favorites.game" -> "game_emb",
      "favor_list" -> "favor_emb"))
    val r = out.collect()(0)
    assert(r.getSeq[Float](r.fieldIndex("title_emb")).toSeq ==
      HashEmbedder.embed("top text", 8).toSeq)
    assert(r.getSeq[Float](r.fieldIndex("game_emb")).toSeq ==
      HashEmbedder.embed("game txt", 8).toSeq)
    val favEmb = r.getSeq[scala.collection.Seq[Float]](r.fieldIndex("favor_emb"))
    assert(favEmb.length == 2)
    assert(favEmb(0).toSeq == HashEmbedder.embed("fav one", 8).toSeq)
  }

  test("unsupported type raises") {
    val df = Seq((1L, 5)).toDF("doc_id", "n")
    intercept[IllegalArgumentException](Enrich.textEmbedding(df, Map("n" -> "x")))
  }
}

class SearchAfterSpec extends SparkSpec {
  import spark.implicits._
  import graft.exec.HybridPipeline

  test("search_after resumes below the cursor with tie-aware keyset") {
    val res = Seq((1L, 0.9), (2L, 0.8), (3L, 0.8), (4L, 0.7))
      .toDF("doc_id", "score")
    // cursor at (0.8, doc 2) → next page: doc 3 (tie, higher id), then doc 4
    val page = HybridPipeline.searchAfter(res, 0.8, 2L, size = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(page == Seq(3L, 4L))
  }
}
