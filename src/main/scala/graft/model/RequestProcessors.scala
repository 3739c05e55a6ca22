package graft.model

/** Request-stage processors: pure spec-to-spec transforms, the Spark
  * counterpart of the reference's search-pipeline request processors.
  */

/** A subquery spec as seen by request processors (pre-compilation). */
/** `analyzer`: the neural_sparse analyzer path (NeuralSparseQueryBuilder
  * .getQueryTokens:509-566) — tokenize the query text instead of running
  * model inference; tokens carry weight 1.0 unless the analyzer supplies
  * payloads (our regex analyzer never does, matching the null-payload
  * default branch). */
case class SubquerySpec(
    kind: String, // neural | neural_sparse | match | term | range
    field: String,
    queryText: Option[String] = None,
    modelId: Option[String] = None,
    queryTokens: Option[Map[String, Float]] = None,
    analyzer: Option[String] = None,
    k: Option[Int] = None, // neural k: candidate depth (maps to pagination depth)
    minScore: Option[Double] = None, // neural min_score: radial cut on the subquery
    maxDistance: Option[Double] = None, // neural max_distance: the distance-space dual (cosine d = 1 − cos)
    queryImage: Option[String] = None, // neural query_image: multimodal {text, image} inference pair
    // Ingest-time artifact columns: when the corpus was enriched at ingest
    // (Enrich.textEmbedding / sparseEncoding — the reference's ingest
    // pipelines exist precisely so queries never re-run inference,
    // processor/TextEmbeddingProcessor.java), point the subquery at the
    // precomputed column and the compiler scores it directly; on-the-fly
    // inference over `field` is only the fallback for un-enriched corpora.
    vecCol: Option[String] = None,     // neural: precomputed dense embedding column
    tokensCol: Option[String] = None)  // neural_sparse/match: precomputed token-map column

/** neural_sparse_two_phase_processor configuration
  * (processor/NeuralSparseTwoPhaseProcessor.java:62-67 defaults: enabled,
  * prune_ratio 0.4 with max_ratio prune, expansion_rate 5.0,
  * max_window_size 10000). As a request processor it is a pure
  * optimization — phase 1 scores only the high-weight query tokens, phase 2
  * rescores the candidate window with the full token set
  * (SparseRetrieval.twoPhaseTopK is the execution). */
case class TwoPhaseSpec(
    enabled: Boolean = true,
    pruneRatio: Float = 0.4f,
    pruneType: String = "max_ratio",
    expansionRate: Float = 5.0f,
    maxWindowSize: Int = 10000)

/** neural_query_enricher (processor/NeuralQueryEnricherProcessor.java:70-108
  * + query/visitor/NeuralSearchQueryVisitor.java): walk the query tree and
  * fill in `default_model_id` / per-field `neural_field_default_id` on
  * neural and neural_sparse subqueries that lack a model. */
object NeuralQueryEnricher {
  def enrich(
      subs: Seq[SubquerySpec],
      defaultModelId: Option[String],
      fieldDefaults: Map[String, String] = Map.empty): Seq[SubquerySpec] =
    subs.map { sq =>
      if ((sq.kind == "neural" || sq.kind == "neural_sparse") && sq.modelId.isEmpty)
        sq.copy(modelId = fieldDefaults.get(sq.field).orElse(defaultModelId))
      else sq
    }
}

/** agentic query translator (processor/AgenticQueryTranslatorProcessor.java,
  * query/AgenticSearchQueryBuilder.java): natural language → concrete query
  * spec. The reference calls an LLM agent out-of-band; the data plane only
  * sees the translated query, so the engine exposes a pluggable translator
  * with a deterministic rule-based default (LLM execution is out of scope —
  * SURVEY.md §7.4).
  */
trait QueryTranslator {
  def translate(naturalLanguage: String, queryFields: Seq[String]): Seq[SubquerySpec]
}

/** Deterministic rule-based translator: "quoted phrases" become match
  * subqueries, the remainder becomes one neural + one neural_sparse subquery
  * over the given fields — enough to exercise the agentic path end-to-end. */
object RuleBasedTranslator extends QueryTranslator {
  private val Quoted = "\"([^\"]+)\"".r
  def translate(naturalLanguage: String, queryFields: Seq[String]): Seq[SubquerySpec] = {
    val field = queryFields.headOption.getOrElse("text")
    val phrases = Quoted.findAllMatchIn(naturalLanguage).map(_.group(1)).toSeq
    val rest = Quoted.replaceAllIn(naturalLanguage, " ").trim
    val phraseSubs = phrases.map(p => SubquerySpec("match", field, queryText = Some(p)))
    val neuralSubs =
      if (rest.nonEmpty)
        Seq(
          SubquerySpec("neural", field, queryText = Some(rest)),
          SubquerySpec("neural_sparse", field, queryText = Some(rest)))
      else Seq.empty
    (phraseSubs ++ neuralSubs).take(HybridLimits.MaxSubqueries)
  }
}
