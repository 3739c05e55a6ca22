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
    tokensCol: Option[String] = None,  // neural_sparse/match: precomputed token-map column
    // neural expand_nested (KNNQueryBuilder.EXPAND_NESTED_FIELD): score every
    // chunk of the semantic field, ScoreMode.Max per document
    expandNested: Option[Boolean] = None,
    // neural rescore {oversample_factor} (k-NN RescoreContext via
    // RESCORE_FIELD, NeuralQueryBuilder.java:649-650): quantized shortlist of
    // ceil(k × oversample), exact full-precision re-rank
    rescoreOversample: Option[Double] = None,
    // neural_sparse method_parameters {top_n, k, heap_factor}
    // (sparse/query/SparseAnnQueryBuilder.java:65-87,126-180): SEISMIC search
    // knobs; on a non-SEISMIC field the reference falls back to the plain
    // sparse query, dropping them
    methodTopN: Option[Int] = None,
    methodK: Option[Int] = None,
    methodHeapFactor: Option[Float] = None,
    // neural semantic_field_search_analyzer (NeuralQueryBuilder.java:639-640):
    // tokenize the query text instead of model inference — valid only when
    // the target semantic field uses a SPARSE model
    // (NeuralQueryValidationUtil.validateNeuralQueryForKnn rejects it on
    // dense targets)
    searchAnalyzer: Option[String] = None)

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
/** The corpus-schema context the reference's agent receives via its system
  * prompt (index mappings are serialized into the LLM prompt by
  * AgenticQueryTranslatorProcessor) — here an explicit parameter so the
  * deterministic rule translator can emit filter subqueries for known
  * metadata fields. */
case class TranslatorSchema(
    textFields: Seq[String],
    langField: Option[String] = None,
    charCountField: Option[String] = None)

object RuleBasedTranslator extends QueryTranslator {
  private val Quoted = "\"([^\"]+)\"".r
  private val Between = "(?i)between (\\d+) and (\\d+) chars?".r
  private val Over = "(?i)(?:over|at least|more than) (\\d+) chars?".r
  private val Under = "(?i)(?:under|at most|less than) (\\d+) chars?".r
  private val InLang = "(?i)\\bin (english|german|french|spanish|italian|portuguese|dutch)\\b".r
  private val LangCodes = Map(
    "english" -> "en", "german" -> "de", "french" -> "fr", "spanish" -> "es",
    "italian" -> "it", "portuguese" -> "pt", "dutch" -> "nl")

  def translate(naturalLanguage: String, queryFields: Seq[String]): Seq[SubquerySpec] =
    translateWithSchema(naturalLanguage, TranslatorSchema(queryFields))

  /** Rules (ordered, each consumes its matched span):
    *   1. "between N and M chars" / "over N chars" / "under N chars" →
    *      range filter on the char-count field (when the schema names one);
    *   2. "in <language>" → term filter on the lang field;
    *   3. "quoted phrases" → match subqueries;
    *   4. the remaining words → neural + neural_sparse semantic pair.
    * Capped at the hybrid limit (filters and phrases take priority — they
    * are the constraints the user stated explicitly). */
  def translateWithSchema(naturalLanguage: String, schema: TranslatorSchema): Seq[SubquerySpec] = {
    val p = translateParts(naturalLanguage, schema)
    (p.phrases ++ p.filters ++ p.semantic).take(HybridLimits.MaxSubqueries)
  }

  /** Conversational form (AgenticSearchQueryBuilder.memoryId → the agent's
    * ML-Commons conversation memory → response ext `memory_id`): prior
    * turns' FILTER constraints — the conversation state a conversational
    * agent carries — are re-derived deterministically and merged UNDER the
    * current turn, latest-binding per (kind, field); a re-stated filter
    * keeps the position of its first statement. Phrases and semantic
    * clauses never carry over (each turn's retrieval intent is its own).
    * The current turn is recorded into the store afterwards. */
  def translateWithMemory(naturalLanguage: String, schema: TranslatorSchema,
      memoryId: String, store: AgentMemoryStore): Seq[SubquerySpec] = {
    val prior = store.turns(memoryId).map(q => translateParts(q, schema))
    val cur = translateParts(naturalLanguage, schema)
    val merged = scala.collection.mutable.LinkedHashMap.empty[(String, String), SubquerySpec]
    (prior.flatMap(_.filters) ++ cur.filters).foreach { f =>
      merged.update((f.kind, f.field), f)
    }
    store.record(memoryId, naturalLanguage)
    (cur.phrases ++ merged.values.toSeq ++ cur.semantic)
      .take(HybridLimits.MaxSubqueries)
  }

  private[graft] case class TranslationParts(phrases: Seq[SubquerySpec],
      filters: Seq[SubquerySpec], semantic: Seq[SubquerySpec])

  private[graft] def translateParts(naturalLanguage: String,
      schema: TranslatorSchema): TranslationParts = {
    val field = schema.textFields.headOption.getOrElse("text")
    var rest = naturalLanguage
    val filters = Seq.newBuilder[SubquerySpec]
    schema.charCountField.foreach { cf =>
      Between.findFirstMatchIn(rest).foreach { m =>
        filters += SubquerySpec("range", cf, queryText = Some(s"${m.group(1)}..${m.group(2)}"))
        rest = Between.replaceFirstIn(rest, " ")
      }
      Over.findFirstMatchIn(rest).foreach { m =>
        filters += SubquerySpec("range", cf, queryText = Some(s"${m.group(1)}.."))
        rest = Over.replaceFirstIn(rest, " ")
      }
      Under.findFirstMatchIn(rest).foreach { m =>
        filters += SubquerySpec("range", cf, queryText = Some(s"..${m.group(1)}"))
        rest = Under.replaceFirstIn(rest, " ")
      }
    }
    schema.langField.foreach { lf =>
      InLang.findFirstMatchIn(rest).foreach { m =>
        filters += SubquerySpec("term", lf,
          queryText = Some(LangCodes(m.group(1).toLowerCase)))
        rest = InLang.replaceFirstIn(rest, " ")
      }
    }
    val phrases = Quoted.findAllMatchIn(rest).map(_.group(1)).toSeq
    rest = Quoted.replaceAllIn(rest, " ").replaceAll("\\s+", " ").trim
    val phraseSubs = phrases.map(p => SubquerySpec("match", field, queryText = Some(p)))
    val neuralSubs =
      if (rest.nonEmpty)
        Seq(
          SubquerySpec("neural", field, queryText = Some(rest)),
          SubquerySpec("neural_sparse", field, queryText = Some(rest)))
      else Seq.empty
    TranslationParts(phraseSubs, filters.result(), neuralSubs)
  }
}

/** Session-scoped conversational memory for the agentic path — the
  * stand-in for the ML-Commons conversation memory the reference's agent
  * resumes by `memory_id` (AgenticSearchQueryBuilder.java:60-109 carries
  * the id; AgenticQueryTranslatorProcessor.java:155-183 threads the
  * agent-returned id into the request context; the response ext surfaces
  * it). Holds the raw prior questions per memory id; the deterministic
  * translator re-derives their constraints on each turn, so the stored
  * state is exactly what a conversational agent's memory contains —
  * turns, not compiled queries. */
final class AgentMemoryStore {
  private val byId =
    scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
  def record(memoryId: String, question: String): Unit = synchronized {
    byId.update(memoryId, byId.getOrElse(memoryId, Vector.empty) :+ question)
  }
  def turns(memoryId: String): Seq[String] =
    synchronized(byId.getOrElse(memoryId, Vector.empty))
}

/** The agent-context payload the reference threads from the translator to
  * the response ext section (query/ext/AgentStepsSearchExtBuilder fields
  * agent_steps_summary / dsl_query, set by AgenticQueryTranslatorProcessor
  * .executeAgentAsync and attached by AgenticContextResponseProcessor
  * .processResponse). memory_id threads through [[AgentMemoryStore]] +
  * RuleBasedTranslator.translateWithMemory and is attached by
  * attachAgentContext when present (the processor reads it unconditionally
  * and null-skips). Both strings are pure functions of the translated
  * subqueries, so the oracle can inline them as literals. */
object AgentContext {

  /** Deterministic steps summary: one clause per translated subquery, in
    * translation order — the rule stand-in for the LLM agent's free-text
    * summary. */
  def stepsSummary(subs: Seq[SubquerySpec]): String =
    subs.map { sq =>
      val qt = sq.queryText.getOrElse("")
      sq.kind match {
        case "term"  => s"filter term ${sq.field}=$qt"
        case "range" => s"filter range ${sq.field}=$qt"
        case "match" => s"match ${sq.field}:\"$qt\""
        case k       => s"$k ${sq.field}:\"$qt\""
      }
    }.mkString(s"rule-based agent translated the question into ${subs.size} subqueries: ", "; ", "")

  /** The translated request re-encoded as the engine's JSON DSL body — the
    * dsl_query string the reference stores in the request context. */
  def dslQuery(subs: Seq[SubquerySpec], k: Int): String = {
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
    val qs = subs.map { sq =>
      val qt = esc(sq.queryText.getOrElse(""))
      s"""{"${sq.kind}": {"${sq.field}": {"query_text": "$qt"}}}"""
    }.mkString(", ")
    s"""{"query": {"hybrid": {"queries": [$qs]}}, "size": $k}"""
  }
}
