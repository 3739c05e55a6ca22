package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Parser for the reference's JSON request DSL — the query/parser package
  * plus the builder fromXContent surface (reference: HybridQueryBuilder
  * .fromXContent, NeuralQueryBuilder.fromXContent, NeuralSparseQueryBuilder
  * .fromXContent). A user of the reference can paste their search body and
  * search-pipeline definition verbatim:
  *
  *   QueryDsl.parse(searchBodyJson, Some(pipelineJson)) : QueryRequest
  *
  * Supported query kinds: hybrid (≤5 subqueries), neural (query_text, k,
  * min_score), neural_sparse (query_text | query_tokens | analyzer), match,
  * term, range (gte/lt). Body params: from, size, pagination_depth (inside
  * hybrid), collapse.field. Pipeline: normalization.technique (+parameters:
  * lower_bounds/upper_bounds for min_max), combination.technique
  * (+parameters.weights).
  *
  * This is deliberately the SEARCH surface, not the REST transport: the
  * output is the same QueryRequest the programmatic API uses, so parsing
  * and execution cannot drift.
  */
object QueryDsl {

  private implicit val formats: Formats = DefaultFormats

  def parse(searchBody: String, pipeline: Option[String] = None,
      fieldSpecs: Seq[FieldSpec] = Nil): graft.exec.QueryCompiler.QueryRequest = {
    val body = JsonMethods.parse(searchBody)
    val (norm, comb) = pipeline.map(parsePipeline).getOrElse(
      (NormalizationSpec.MinMax(): NormalizationSpec,
        CombinationSpec.ArithmeticMean(): CombinationSpec))
    val twoPhase = pipeline.flatMap(parseTwoPhase)

    val queryObj = body \ "query"
    val (subs, paginationDepth) = queryObj match {
      case JObject(fields) => fields match {
        case ("hybrid", hybrid) :: Nil =>
          val qs = (hybrid \ "queries") match {
            case JArray(arr) => arr.map(parseSubquery)
            case _ => throw new IllegalArgumentException("hybrid.queries must be an array")
          }
          val pd = (hybrid \ "pagination_depth").toOption.map(_.extract[Int])
          (qs, pd)
        case (kind, q) :: Nil => (List(parseSubquery(JObject(kind -> q))), None)
        case _ => throw new IllegalArgumentException("query must contain exactly one root operator")
      }
      case _ => throw new IllegalArgumentException("missing query object")
    }

    val from = (body \ "from").toOption.map(_.extract[Int]).getOrElse(0)
    val size = (body \ "size").toOption.map(_.extract[Int]).getOrElse(HybridLimits.DefaultK)
    val collapseField = (body \ "collapse" \ "field").toOption.map(_.extract[String])
    val minScore = (body \ "min_score").toOption.map(_.extract[Double])
    val postFilter = (body \ "post_filter").toOption.map(filterExprOf)
    // body `sort`: the FULL ordered sort-field list with directions, every
    // JSON form the reference accepts — "f", ["f"], [{"f": "desc"}],
    // [{"f": {"order": "desc"}}, "g"], {"f": "asc"}. Default direction asc
    // (reference SortBuilder default); "_score" alone = plain score sort
    // (empty list); mixing _score with field sorts is out of this engine's
    // scope — fail loud, never silently rank by the wrong key.
    def dirOf(j: JValue): Boolean = j match { // true = ascending
      case JString("asc")  => true
      case JString("desc") => false
      case JObject(fields) => fields.collectFirst {
        case ("order", JString("asc"))  => true
        case ("order", JString("desc")) => false
      }.getOrElse(true)
      case JNothing | JNull => true
      case other => throw new IllegalArgumentException(
        s"unsupported sort direction: ${JsonMethods.compact(other)}")
    }
    def sortEntries(j: JValue): Seq[(String, Boolean)] = j match {
      case JNothing | JNull => Nil
      case JString(f)       => Seq(f -> true)
      case JObject(fields)  => fields.map { case (f, d) => f -> dirOf(d) }
      case JArray(arr)      => arr.flatMap(sortEntries)
      case other => throw new IllegalArgumentException(
        s"unsupported sort form: ${JsonMethods.compact(other)}")
    }
    val allSorts = sortEntries(body \ "sort")
    val sortFields = allSorts.filterNot(_._1 == "_score")
      .map { case (f, asc) => graft.exec.HybridPipeline.SortField(f, asc) }
    require(sortFields.isEmpty || allSorts.forall(_._1 != "_score"),
      "mixing _score with field sorts is not supported")
    // body `search_after`: cursor values in sort order (+ trailing doc_id)
    val searchAfter = (body \ "search_after").toOption.collect {
      case JArray(arr) => arr.map {
        case JString(s)  => s: Any
        case JInt(i)     => i.toLong: Any
        case JLong(l)    => l: Any
        case JDouble(d)  => d: Any
        case JDecimal(d) => d.toDouble: Any
        case JNull       => null: Any
        case other => throw new IllegalArgumentException(
          s"unsupported search_after value: ${JsonMethods.compact(other)}")
      }
      case other => throw new IllegalArgumentException(
        s"search_after must be an array, got ${JsonMethods.compact(other)}")
    }

    graft.exec.QueryCompiler.QueryRequest(
      subqueries = subs,
      k = size,
      from = from,
      paginationDepth = paginationDepth,
      normalization = norm,
      combination = comb,
      postFilterExpr = postFilter,
      collapseField = collapseField,
      collapseDocsPerGroup = 1,
      minScore = minScore,
      twoPhase = twoPhase,
      sortFields = sortFields,
      searchAfter = searchAfter,
      fieldSpecs = fieldSpecs)
  }

  /** request_processors: [{"neural_sparse_two_phase_processor":
    *   {"enabled": true, "two_phase_parameter": {"prune_ratio": 0.4,
    *    "prune_type": "max_ratio", "expansion_rate": 5.0,
    *    "max_window_size": 10000}}}] — the reference's processor factory
    * surface (NeuralSparseTwoPhaseProcessor.Factory). */
  private[graft] def parseTwoPhase(json: String): Option[TwoPhaseSpec] = {
    val root = JsonMethods.parse(json)
    val procs = (root \ "request_processors") match {
      case JArray(arr) => arr
      case _           => Nil
    }
    procs.collectFirst {
      case JObject(("neural_sparse_two_phase_processor", inner) :: Nil) =>
        val p = inner \ "two_phase_parameter"
        TwoPhaseSpec(
          enabled = (inner \ "enabled").toOption.map(_.extract[Boolean]).getOrElse(true),
          pruneRatio = (p \ "prune_ratio").toOption.map(_.extract[Double].toFloat).getOrElse(0.4f),
          pruneType = (p \ "prune_type").toOption.map(_.extract[String]).getOrElse("max_ratio"),
          expansionRate = (p \ "expansion_rate").toOption.map(_.extract[Double].toFloat).getOrElse(5.0f),
          maxWindowSize = (p \ "max_window_size").toOption.map(_.extract[Int]).getOrElse(10000))
    }
  }

  /** `post_filter` body (term / range), translated to a Spark SQL predicate.
    * Same surface as the filter contexts the reference accepts on hybrid
    * (HybridQueryPostFilterIT uses term/range filters). */
  private[graft] def filterExprOf(j: JValue): String = j match {
    case JObject(("term", JObject((field, params) :: Nil)) :: Nil) =>
      // accepted forms: bare scalar ("en", 300, true) or {"value": …};
      // string values quote, numerics/booleans compare natively
      def lit(v: JValue): String = v match {
        case JString(s)  => s"'${s.replace("'", "''")}'"
        case JBool(b)    => b.toString
        case JNothing | JNull =>
          throw new IllegalArgumentException("term filter needs a value")
        case other       => jvNum(other)
      }
      val v = params match {
        case o: JObject => lit(o \ "value")
        case scalar     => lit(scalar)
      }
      s"$field = $v"
    case JObject(("range", JObject((field, params) :: Nil)) :: Nil) =>
      val conds = Seq(
        (params \ "gte").toOption.map(v => s"$field >= ${jvNum(v)}"),
        (params \ "gt").toOption.map(v => s"$field > ${jvNum(v)}"),
        (params \ "lte").toOption.map(v => s"$field <= ${jvNum(v)}"),
        (params \ "lt").toOption.map(v => s"$field < ${jvNum(v)}")).flatten
      require(conds.nonEmpty, "range filter needs at least one bound")
      conds.mkString(" AND ")
    case other =>
      throw new IllegalArgumentException(
        s"unsupported post_filter: ${JsonMethods.compact(other)}")
  }

  /** One subquery object, e.g. {"neural": {"emb_field": {"query_text": …}}}. */
  private[graft] def parseSubquery(j: JValue): SubquerySpec = j match {
    // checked BEFORE the generic single-field destructuring, which would
    // otherwise match {"hybrid": {"queries": […]}} as kind=hybrid/
    // field=queries and report a misleading "unknown query kind"
    case JObject(("hybrid", _) :: _) =>
      throw new IllegalArgumentException(
        "hybrid query cannot be nested inside another hybrid query")
    case JObject((kind, JObject((field, params) :: Nil)) :: Nil) =>
      kind match {
        case "neural" =>
          val k = (params \ "k").toOption.map(_.extract[Int])
          val minScore = (params \ "min_score").toOption.map(_.extract[Double])
          val maxDistance = (params \ "max_distance").toOption.map(_.extract[Double])
          // NeuralQueryValidationUtil.countKnnQueryTypes: at most one of
          // k / max_distance / min_score
          require(Seq(k, minScore, maxDistance).count(_.isDefined) <= 1,
            "Only one of k, max_distance, or min_score can be provided")
          // rescore: true → default RescoreContext (oversample 1.0),
          // false/absent → none, object → oversample_factor (RescoreParser)
          val rescore = (params \ "rescore") match {
            case JBool(true)                     => Some(1.0)
            case JBool(false) | JNothing | JNull => None
            case o: JObject =>
              Some((o \ "oversample_factor").toOption.map(_.extract[Double]).getOrElse(1.0))
            case other => throw new IllegalArgumentException(
              s"rescore must be a boolean or an object: ${JsonMethods.compact(other)}")
          }
          rescore.foreach(f => require(f > 0.0, "oversample_factor must be a positive float"))
          val modelId = (params \ "model_id").toOption.map(_.extract[String])
          val searchAnalyzer =
            (params \ "semantic_field_search_analyzer").toOption.map(_.extract[String])
          searchAnalyzer.foreach(a => require(a.nonEmpty,
            "semantic_field_search_analyzer field can not be empty"))
          // NeuralQueryValidationUtil.validateNeuralQueryForSemanticSparse:
          // model_id and semantic_field_search_analyzer can not coexist
          require(!(modelId.isDefined && searchAnalyzer.isDefined),
            "query_tokens, model_id and semantic_field_search_analyzer can not coexist")
          SubquerySpec("neural", field,
            queryText = (params \ "query_text").toOption.map(_.extract[String]),
            modelId = modelId,
            k = k,
            minScore = minScore,
            maxDistance = maxDistance,
            queryImage = (params \ "query_image").toOption.map(_.extract[String]),
            expandNested = (params \ "expand_nested").toOption.map(_.extract[Boolean]),
            rescoreOversample = rescore,
            searchAnalyzer = searchAnalyzer)
        case "neural_sparse" =>
          val tokens = (params \ "query_tokens").toOption.collect {
            case JObject(tf) => tf.map { case (t, v) => t -> v.extract[Double].toFloat }.toMap
          }
          // method_parameters {top_n, k, heap_factor} — SparseAnnQueryBuilder
          // .fromXContent: unknown keys and non-positive values are parse
          // errors (sparse/query/SparseAnnQueryBuilder.java:126-180)
          val (topN, mk, heapFactor) = (params \ "method_parameters") match {
            case JNothing | JNull => (None, None, None)
            case JObject(fields) =>
              fields.foreach { case (key, _) =>
                require(Set("top_n", "k", "heap_factor")(key),
                  s"[neural_sparse] unknown field [$key]")
              }
              val m = fields.toMap
              val tn = m.get("top_n").map(_.extract[Int])
              tn.foreach(v => require(v > 0, "[neural_sparse] top_n must be a positive integer"))
              val kk = m.get("k").map(_.extract[Int])
              kk.foreach(v => require(v > 0, "[neural_sparse] k must be a positive integer"))
              val hf = m.get("heap_factor").map(_.extract[Double].toFloat)
              hf.foreach(v => require(v > 0, "[neural_sparse] heap_factor must be a positive float"))
              (tn, kk, hf)
            case _ => throw new IllegalArgumentException(
              "[neural_sparse] method_parameters must be an object")
          }
          SubquerySpec("neural_sparse", field,
            queryText = (params \ "query_text").toOption.map(_.extract[String]),
            modelId = (params \ "model_id").toOption.map(_.extract[String]),
            queryTokens = tokens,
            analyzer = (params \ "analyzer").toOption.map(_.extract[String]),
            methodTopN = topN,
            methodK = mk,
            methodHeapFactor = heapFactor)
        case "match" =>
          // {"match": {"field": "text value"}} or {"match": {"field": {"query": …}}}
          val qt = params match {
            case JString(s) => Some(s)
            case o => (o \ "query").toOption.map(_.extract[String])
          }
          SubquerySpec("match", field, queryText = qt)
        case "term" =>
          val qt = params match {
            case JString(s) => Some(s)
            case o => (o \ "value").toOption.map(_.extract[String])
          }
          SubquerySpec("term", field, queryText = qt)
        case "range" =>
          val gte = (params \ "gte").toOption.map(jvNum).getOrElse("")
          val lt = (params \ "lt").toOption.map(jvNum).getOrElse("")
          SubquerySpec("range", field, queryText = Some(s"$gte..$lt"))
        case other =>
          throw new IllegalArgumentException(s"unknown query kind: $other")
      }
    case _ =>
      throw new IllegalArgumentException(s"malformed subquery: ${JsonMethods.compact(j)}")
  }

  private def jvNum(j: JValue): String = j match {
    case JInt(v)     => v.toString
    case JLong(v)    => v.toString
    case JDouble(v)  => v.toString
    case JDecimal(v) => v.toString
    case JString(v)  => v
    case other       => other.extract[String]
  }

  /** Search-pipeline definition: {"phase_results_processors": [
    *   {"normalization-processor": {"normalization": {"technique": …},
    *                                "combination": {"technique": …}}}]}
    * or the bare inner object. */
  private[graft] def parsePipeline(json: String): (NormalizationSpec, CombinationSpec) = {
    val root = JsonMethods.parse(json)
    val proc = (root \ "phase_results_processors") match {
      case JArray(arr) =>
        arr.collectFirst {
          case JObject((name, inner) :: Nil)
              if name == "normalization-processor" || name == "score-ranker-processor" => inner
        }.getOrElse(throw new IllegalArgumentException("no normalization processor in pipeline"))
      case _ => root // bare {"normalization": …, "combination": …}
    }
    val normTech = (proc \ "normalization" \ "technique").toOption
      .map(_.extract[String]).getOrElse("min_max")
    val norm: NormalizationSpec = normTech match {
      case "min_max" =>
        val lows = boundsOf(proc \ "normalization" \ "parameters" \ "lower_bounds",
          isLower = true)
        val highs = boundsOf(proc \ "normalization" \ "parameters" \ "upper_bounds",
          isLower = false)
        val n = math.max(lows.length, highs.length)
        if (n == 0) NormalizationSpec.MinMax()
        else NormalizationSpec.MinMax((0 until n).map { i =>
          (lows.lift(i).getOrElse(ScoreBound.disabledLower),
            highs.lift(i).getOrElse(ScoreBound.disabledUpper))
        })
      case "rrf" =>
        val rc = (proc \ "normalization" \ "parameters" \ "rank_constant").toOption
          .map(_.extract[Int]).getOrElse(HybridLimits.DefaultRankConstant)
        NormalizationSpec.RRF(rc)
      case other => NormalizationSpec.fromString(other)
    }
    val combTech = (proc \ "combination" \ "technique").toOption
      .map(_.extract[String]).getOrElse("arithmetic_mean")
    val weights = (proc \ "combination" \ "parameters" \ "weights") match {
      case JArray(ws) => Some(ws.map(_.extract[Double]))
      case _          => None
    }
    val comb: CombinationSpec = combTech match {
      case "arithmetic_mean" => CombinationSpec.ArithmeticMean(weights)
      case "geometric_mean"  => CombinationSpec.GeometricMean(weights)
      case "harmonic_mean"   => CombinationSpec.HarmonicMean(weights)
      case "rrf"             => CombinationSpec.RRF(weights)
      case other => throw new IllegalArgumentException(s"unknown combination technique: $other")
    }
    (norm, comb)
  }

  private def boundsOf(j: JValue, isLower: Boolean): Seq[ScoreBound] = j match {
    case JArray(arr) => arr.map {
      case JObject(fields) =>
        val m = fields.toMap
        val mode = m.get("mode").map(_.extract[String]).getOrElse("")
        val score = m.get(if (isLower) "min_score" else "max_score")
          .map(_.extract[Double].toFloat)
          .getOrElse(if (isLower) 0.0f else 1.0f)
        ScoreBound(enabled = true, BoundMode.fromString(mode), score)
      case _ => if (isLower) ScoreBound.disabledLower else ScoreBound.disabledUpper
    }
    case _ => Nil
  }
}
