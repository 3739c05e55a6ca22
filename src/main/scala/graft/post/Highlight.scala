package graft.post

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ml.HashEmbedder

/** Semantic highlighting — the reference marks query-relevant sentences in
  * each top hit via a QA span model (highlight/SemanticHighlighter.java,
  * engine single/SemanticHighlighterEngine.java:87-158; batch variant
  * highlight/batch/processor/SemanticHighlightingProcessor.java). The model
  * returns CHARACTER SPANS over the original context and
  * highlight/utils/HighlightTagApplier.java:36-115 inserts the pre/post tags
  * at span boundaries, preserving every original character (whitespace runs,
  * newlines) outside and inside the spans.
  *
  * This engine reproduces that pipeline with a deterministic stand-in for
  * the QA model:
  *   1. [[segmentSentences]] — rule-based sentence segmentation WITH
  *      offsets: a boundary falls after a `[.!?]` run followed by
  *      whitespace (the whitespace run separates, the punctuation stays
  *      with its sentence); a field without sentence punctuation is one
  *      sentence, as in the reference.
  *   2. per-sentence relevance — embedding similarity of query vs sentence
  *      on the existing model surface (HashEmbedder.similarity), replacing
  *      the QA span model's sentence logits.
  *   3. span selection — sentences scoring ≥ `threshold` × best-sentence
  *      score become highlight spans (start/end in the ORIGINAL text).
  *   4. [[applyTags]] — the HighlightTagApplier contract verbatim: spans
  *      must be sorted, non-overlapping, in-bounds, unique starts (invalid
  *      spans throw); tags are spliced in and all other characters pass
  *      through untouched.
  *
  * Batch mode ([[highlightBatch]]) mirrors
  * SemanticHighlightingProcessor/BatchExecutor: hits are paginated into
  * sub-batches of `maxInferenceBatchSize` and the model runs once per
  * sub-batch (mapPartitions), with results applied back per hit — the same
  * seam as the ingest-side subBatchExecute analogue (q_embed_batched).
  */
/** Scoring head for [[Highlight.answerSpan]]'s window search — the seam
  * where the reference's QUESTION_ANSWERING model plugs in
  * (highlight/single/SemanticHighlighterEngine.java:87-158 scores start/end
  * logits from the QA model; this engine's no-egress stand-in scores the
  * window substring's embedding similarity). Implementations must be pure
  * functions of (queryText, windowText): span MECHANICS — token offsets,
  * the (sim desc, start asc, width asc) tie-break, char-span emission over
  * the original text — are fixed by answerSpan and identical under every
  * scorer; only the number attached to a candidate window changes. A real
  * QA head drops in by scoring a window as startLogit(first token) +
  * endLogit(last token). */
trait SpanScorer extends Serializable {
  /** Raw (unrounded) relevance of one candidate token window; answerSpan
    * applies the house round-6 before comparing. */
  def score(queryText: String, windowText: String): Double
}

/** Default deterministic stand-in: hash-embedder similarity of the query
  * vs the window substring (includes intra-window whitespace; the
  * substring re-tokenizes to exactly the window's tokens). */
final case class SimilaritySpanScorer(dim: Int = HashEmbedder.DefaultDim)
    extends SpanScorer {
  def score(queryText: String, windowText: String): Double =
    HashEmbedder.similarity(queryText, windowText, dim).toDouble
}

/** The DEFAULT scorer everywhere a caller doesn't supply one: delegates to
  * the process-global [[graft.ml.ModelRegistry]] QA-head slot at CALL time,
  * so installing a real model client swaps every highlight path at once
  * (single answerSpan, the answerSpans relation, and the batch processor).
  * With the default [[graft.ml.HashModelClient]] this is numerically
  * identical to [[SimilaritySpanScorer]]. */
final case class RegistrySpanScorer(dim: Int = HashEmbedder.DefaultDim)
    extends SpanScorer {
  def score(queryText: String, windowText: String): Double =
    graft.ml.ModelRegistry.current.spanScore(queryText, windowText, dim)
}

object Highlight {

  val DefaultPreTag = "<em>"
  val DefaultPostTag = "</em>"

  /** max_inference_batch_size default
    * (highlight/SemanticHighlightingConstants.java). */
  val DefaultMaxInferenceBatchSize = 100

  /** A sentence's [start, end) character span in the original text. */
  case class SentenceSpan(ord: Int, start: Int, end: Int)

  private val BoundaryRe = java.util.regex.Pattern.compile("([.!?])(\\s+)")

  /** Sentence segmentation with offsets: pieces between `[.!?]\s+`
    * boundaries. The whitespace run after the punctuation is a separator
    * (belongs to no sentence); empty pieces (text ending in a boundary) are
    * dropped. Offsets are over the original string, so
    * `text.substring(s.start, s.end)` IS the sentence. */
  def segmentSentences(text: String): Seq[SentenceSpan] = {
    if (text == null || text.isEmpty) return Seq.empty
    val m = BoundaryRe.matcher(text)
    val out = Seq.newBuilder[SentenceSpan]
    var pos = 0
    var ord = 1
    while (m.find()) {
      val sentEnd = m.end(1) // include the punctuation run's matched char
      if (sentEnd > pos) { out += SentenceSpan(ord, pos, sentEnd); ord += 1 }
      pos = m.end(2) // skip the whitespace separator
    }
    if (pos < text.length) out += SentenceSpan(ord, pos, text.length)
    out.result()
  }

  /** Relevance of each sentence to the query on the model surface —
    * the deterministic stand-in for the QA span model's logits. */
  def scoreSentences(queryText: String, text: String,
      spans: Seq[SentenceSpan],
      scorer: SpanScorer = RegistrySpanScorer()): Seq[Double] =
    spans.map(sp => scorer.score(queryText, text.substring(sp.start, sp.end)))

  /** HighlightTagApplier.applyTags (reference
    * highlight/utils/HighlightTagApplier.java:36-115): validates that spans
    * are numeric-bounded, sorted by start, without duplicate starts and
    * without overlap, then splices the tags in, preserving every other
    * character of the original text. Invalid spans throw (the reference
    * throws OpenSearchException). Empty span list returns the text
    * unchanged (engine contract: empty highlights → original context). */
  def applyTags(text: String, spans: Seq[(Int, Int)],
      preTag: String = DefaultPreTag, postTag: String = DefaultPostTag): String = {
    if (spans.isEmpty) return text
    spans.foreach { case (s, e) =>
      require(s >= 0 && e <= text.length && s < e,
        s"Invalid highlight positions: start=$s, end=$e, textLength=${text.length}")
    }
    spans.sliding(2).foreach {
      case Seq((ps, pe), (cs, _)) =>
        require(cs >= ps, "Invalid highlight positions: highlights are not sorted by start position")
        require(cs != ps, s"Invalid highlight positions: duplicate start position $cs")
        require(cs >= pe, s"Invalid highlight positions: overlapping spans")
      case _ =>
    }
    val sb = new java.lang.StringBuilder(text.length + (preTag.length + postTag.length) * spans.size)
    var pos = 0
    spans.foreach { case (s, e) =>
      if (s > pos) sb.append(text, pos, s)
      sb.append(preTag).append(text, s, e).append(postTag)
      pos = e
    }
    if (pos < text.length) sb.append(text, pos, text.length)
    sb.toString
  }

  /** Single-document highlighting: segment → score → select ≥ threshold ×
    * best → tag. Best score ≤ 0 means no sentence matched — the original
    * context comes back untouched (reference: empty highlights list). */
  def highlightText(queryText: String, docText: String,
      threshold: Double = 0.999, preTag: String = DefaultPreTag,
      postTag: String = DefaultPostTag,
      scorer: SpanScorer = RegistrySpanScorer()): String = {
    val spans = segmentSentences(docText)
    if (spans.isEmpty) return docText
    val scores = scoreSentences(queryText, docText, spans, scorer)
    val best = scores.max
    if (best <= 0.0) return docText
    val selected = spans.zip(scores).collect {
      case (sp, sc) if sc >= best * threshold => (sp.start, sp.end)
    }
    applyTags(docText, selected, preTag, postTag)
  }

  /** DataFrame form: adds a `highlights` column for the given text column
    * (the single-inference path — one model call per hit). */
  def highlight(results: DataFrame, queryText: String, textCol: String,
      threshold: Double = 0.999,
      scorer: SpanScorer = RegistrySpanScorer()): DataFrame = {
    val u = udf((d: String) => highlightText(queryText, d, threshold, scorer = scorer))
    results.withColumn("highlights", u(col(textCol)))
  }

  /** Per-sentence relation: one row per (doc, sentence) with offsets,
    * similarity, and the highlight decision — the observable form of the
    * span model's output (SentenceHighlightingRequest → highlights list
    * with start/end per sentence). */
  def sentenceRelation(results: DataFrame, queryText: String, textCol: String,
      threshold: Double = 0.999,
      scorer: SpanScorer = RegistrySpanScorer()): DataFrame = {
    val u = udf((d: String) => {
      val spans = segmentSentences(d)
      val scores = scoreSentences(queryText, d, spans, scorer)
      val best = if (scores.isEmpty) 0.0 else scores.max
      spans.zip(scores).map { case (sp, sc) =>
        (sp.ord, sp.start, sp.end, sc, best > 0.0 && sc >= best * threshold)
      }
    })
    results
      .withColumn("s", explode(u(col(textCol))))
      .select(col("doc_id"),
        col("s._1").as("ord"), col("s._2").as("sent_start"),
        col("s._3").as("sent_end"), col("s._4").as("sim"),
        col("s._5").as("highlighted"))
  }

  /** Token offsets: [start, end) of each `\S+` run over `s` (same
    * whitespace class as HashEmbedder.tokenize's `\s+` split, so a window
    * substring tokenizes to exactly the window's tokens). */
  private[graft] def tokenSpans(s: String): Array[(Int, Int)] = {
    val m = java.util.regex.Pattern.compile("\\S+").matcher(s)
    val out = Array.newBuilder[(Int, Int)]
    while (m.find()) out += ((m.start, m.end))
    out.result()
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Word-level answer span — the sub-sentence output of the reference's
    * QA span model (the sentence_highlighting model type consumed by
    * SemanticHighlighterEngine.getHighlightedSentences, highlight/single/
    * SemanticHighlighterEngine.java:87-95, which returns word-range char
    * spans over the context, not whole sentences). Deterministic stand-in:
    *   1. pick the top sentence by (round(sim, 6) desc, ord asc) — the
    *      6-dp rounding happens BEFORE the argmax on both engines (the
    *      float-determinism protocol);
    *   2. inside it, score every token window of width 1..maxWindow
    *      against the query on the model surface (similarity of the
    *      window SUBSTRING — includes intra-window whitespace, tokenizes
    *      back to exactly the window tokens);
    *   3. emit the best window's character span over the ORIGINAL text,
    *      ties by (span_start asc, width asc).
    * Returns None when no sentence or no window scores > 0 (the
    * reference's empty-highlights contract). */
  def answerSpan(queryText: String, docText: String, maxWindow: Int = 8,
      dim: Int = HashEmbedder.DefaultDim,
      scorer: Option[SpanScorer] = None): Option[(Int, Int, Int, Double)] = {
    val head = scorer.getOrElse(RegistrySpanScorer(dim))
    val sents = segmentSentences(docText)
    if (sents.isEmpty) return None
    val scored = sents.zip(scoreSentences(queryText, docText, sents, head).map(round6))
    val (top, topSim) = scored.minBy { case (sp, sc) => (-sc, sp.ord) }
    if (topSim <= 0.0) return None
    val sent = docText.substring(top.start, top.end)
    val toks = tokenSpans(sent)
    if (toks.isEmpty) return None
    val n = toks.length
    var bestSim = 0.0; var bestStart = -1; var bestEnd = -1; var bestW = Int.MaxValue
    var w = 1
    while (w <= math.min(maxWindow, n)) {
      var i = 0
      while (i + w <= n) {
        val s0 = toks(i)._1; val e0 = toks(i + w - 1)._2
        val sim = round6(head.score(queryText, sent.substring(s0, e0)))
        val better = sim > bestSim ||
          (sim == bestSim && bestStart >= 0 &&
            (s0 < bestStart || (s0 == bestStart && w < bestW)))
        if (better) { bestSim = sim; bestStart = s0; bestEnd = e0; bestW = w }
        i += 1
      }
      w += 1
    }
    if (bestStart < 0) None
    else Some((top.ord, top.start + bestStart, top.start + bestEnd, bestSim))
  }

  /** DataFrame form of [[answerSpan]]: one row per doc with a span —
    * [doc_id, ord, span_start, span_end, sim]; docs with no positive
    * window are dropped (empty highlights). */
  def answerSpans(results: DataFrame, queryText: String, textCol: String,
      maxWindow: Int = 8, scorer: Option[SpanScorer] = None): DataFrame = {
    // asNondeterministic is a PLAN constraint, not a semantics one (the
    // kernel is pure): a deterministic UDF lets Catalyst push the derived
    // `isnotnull(UDF(text))` filter below the caller's top-k join onto the
    // full corpus scan (the O(corpus × window²) kernel then runs over every
    // document for a k-row result) and re-evaluates the UDF once per
    // projected struct field. Nondeterministic blocks both: one evaluation
    // per surviving row, strictly above the join. PlansSpec asserts the
    // placement.
    val u = udf((d: String) => answerSpan(queryText, d, maxWindow, scorer = scorer))
      .asNondeterministic().withName("answer_span")
    results
      .withColumn("a", u(col(textCol)))
      .where(col("a").isNotNull)
      .select(col("doc_id"), col("a._1").as("ord"),
        col("a._2").as("span_start"), col("a._3").as("span_end"),
        col("a._4").as("sim"))
  }

  /** Batch-mode highlighting (SemanticHighlightingProcessor analogue): the
    * hits stream through mapPartitions in sub-batches of
    * `maxInferenceBatchSize`; each sub-batch is one "inference call" whose
    * results are applied back to its hits in order (BatchExecutor +
    * HighlightResultApplier). Output is row-identical to the single path —
    * batching is an execution seam, not a semantic change. */
  def highlightBatch(results: DataFrame, queryText: String, textCol: String,
      threshold: Double = 0.999,
      maxInferenceBatchSize: Int = DefaultMaxInferenceBatchSize,
      scorer: SpanScorer = RegistrySpanScorer()): DataFrame = {
    val schema = StructType(results.schema.fields :+ StructField("highlights", StringType, nullable = true))
    val textIdx = results.schema.fieldIndex(textCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    results.mapPartitions { rows =>
      rows.grouped(maxInferenceBatchSize).flatMap { batch =>
        // one "model call" per sub-batch: contexts in, tagged strings out
        val contexts = batch.map(_.getString(textIdx))
        val tagged = contexts.map(c => highlightText(queryText, c, threshold, scorer = scorer))
        batch.zip(tagged).map { case (r, h) => Row.fromSeq(r.toSeq :+ h) }
      }
    }(enc)
  }

  /** QueryTextExtractorRegistry analogue (highlight/single/extractor):
    * derive the highlight query text from the request's subquery tree so
    * the highlighter needs no separately-supplied text.
    *   - neural / neural_sparse → the original query text regardless of
    *     field (NeuralQueryTextExtractor returns
    *     NeuralKNNQuery.getOriginalQueryText unconditionally);
    *   - term / match → the text only when the subquery targets the
    *     highlighted field (TermQueryTextExtractor field check);
    *   - range and anything else → nothing;
    *   - the hybrid root deduplicates sub-texts and joins with spaces
    *     (HybridQueryTextExtractor; it uses an unordered HashSet — we keep
    *     first-seen order for determinism, a documented divergence).
    * MUST_NOT pruning (BooleanQueryTextExtractor) has no analogue here:
    * the engine's hybrid tree has no prohibited clauses. */
  def extractQueryText(subs: Seq[graft.model.SubquerySpec], fieldName: String): String =
    subs.flatMap { sq =>
      sq.kind match {
        case "neural" | "neural_sparse"              => sq.queryText
        case "term" | "match" if sq.field == fieldName => sq.queryText
        case _                                        => None
      }
    }.filter(_.nonEmpty).distinct.mkString(" ").trim
}
