package graft.post

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ml.HashEmbedder

/** Semantic highlighting — the reference marks query-relevant sentences in
  * each top hit via a QA model (highlight/SemanticHighlighter.java, engine
  * single/SemanticHighlighterEngine.java:87-158; batch variant
  * highlight/batch/processor/SemanticHighlightingProcessor.java).
  *
  * Deterministic stand-in for the QA model: sentences are scored by
  * embedding cosine against the query; sentences scoring ≥ `threshold` ×
  * best-sentence score are wrapped in the highlight tags. Sentence
  * segmentation: split after [.!?] runs; if the text has no sentence
  * punctuation the whole field is one sentence (reference behaves the same
  * on single-sentence fields).
  *
  * Applied post-top-k (a projection over ≤ k rows), batch mode = the same
  * UDF evaluated once per partition batch — mirroring the reference's
  * single vs batch inference split.
  *
  * Known divergence: sentences are rejoined with a single space, so
  * original inter-sentence whitespace (newlines, runs of spaces) is
  * normalized in the highlighted output; the DuckDB oracle replicates the
  * same normalization. Preserve-original-spans would require carrying
  * sentence offsets through the split.
  */
object Highlight {

  val DefaultPreTag = "<em>"
  val DefaultPostTag = "</em>"

  def splitSentences(text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val out = text.split("(?<=[.!?])\\s+").toSeq.filter(_.nonEmpty)
    if (out.isEmpty) Seq(text) else out
  }

  def highlightText(queryText: String, docText: String,
      threshold: Double = 0.999, preTag: String = DefaultPreTag,
      postTag: String = DefaultPostTag): String = {
    val sents = splitSentences(docText)
    if (sents.isEmpty) return docText
    val scores = sents.map(s => HashEmbedder.similarity(queryText, s).toDouble)
    val best = scores.max
    if (best <= 0.0) return docText
    sents.zip(scores).map { case (s, sc) =>
      if (sc >= best * threshold) s"$preTag$s$postTag" else s
    }.mkString(" ")
  }

  /** DataFrame form: adds a `highlights` column for the given text column. */
  def highlight(results: DataFrame, queryText: String, textCol: String,
      threshold: Double = 0.999): DataFrame = {
    val u = udf((d: String) => highlightText(queryText, d, threshold))
    results.withColumn("highlights", u(col(textCol)))
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
