package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions
import graft.ingest.Enrich
import graft.ml.HashEmbedder
import graft.model._

/** The `QuerySpec → DataFrame` compiler promised by SURVEY.md §3.1: one
  * declarative request object compiles to the full retrieval plan
  *
  *   corpus → filter → [subquery score exprs] → per-subquery topK →
  *   normalize → combine → collapse? → sort/paginate
  *
  * This is the engine's user-facing entry point — the Spark analogue of
  * `POST /index/_search` with a hybrid body. Subquery kinds mirror the
  * reference's registered queries (neural, neural_sparse, match, term,
  * range); request processors (enricher, agentic translation) run as pure
  * spec-to-spec passes before compilation.
  */
object QueryCompiler {

  case class QueryRequest(
      queryId: Long = 0L,
      subqueries: Seq[SubquerySpec],
      k: Int = HybridLimits.DefaultK,
      from: Int = 0,
      paginationDepth: Option[Int] = None,
      normalization: NormalizationSpec = NormalizationSpec.MinMax(),
      combination: CombinationSpec = CombinationSpec.ArithmeticMean(),
      filterExpr: Option[String] = None,
      postFilterExpr: Option[String] = None,
      collapseField: Option[String] = None,
      collapseDocsPerGroup: Int = 1,
      minScore: Option[Double] = None,
      explain: Boolean = false,
      // request-pipeline state (see guards in run):
      twoPhase: Option[TwoPhaseSpec] = None,   // neural_sparse_two_phase_processor
      // body `sort` (non-score sorts, in order, with direction) — routes the
      // request through the field collector (HybridPipeline.runSortedFields)
      sortFields: Seq[HybridPipeline.SortField] = Nil,
      // body `search_after`: one cursor value per sort field plus a trailing
      // doc_id tie-break (score-sorted bodies: [score, doc_id])
      searchAfter: Option[Seq[Any]] = None,
      fieldSpecs: Seq[FieldSpec] = Nil,        // index mapping registry (SEISMIC marks)
      // prebuilt SEISMIC index (ingest artifact) for method_parameters
      // dispatch; omitted → one-shot build
      seismicIndex: Option[graft.seismic.Seismic.SeismicIndex] = None)

  /** Compile one subquery spec into its score column over the corpus.
    * Null = no match for that subquery (reference scorer no-hit).
    *
    * Doc-side inference runs ONLY when the spec names no ingest-time
    * column: an enriched corpus (vecCol/tokensCol set) is scored directly
    * off the precomputed column — at 100 TB re-embedding the corpus per
    * query is the exact cost the reference's ingest pipeline exists to
    * avoid (processor/TextEmbeddingProcessor.java). */
  def scoreColumn(sq: SubquerySpec, dim: Int = HashEmbedder.DefaultDim): Column = sq.kind match {
    case "neural" =>
      // both radial forms set is a parse error in the reference
      // (NeuralQueryBuilder.java:166-170)
      require(sq.minScore.isEmpty || sq.maxDistance.isEmpty,
        "neural query accepts min_score OR max_distance, not both")
      // query_image present → one multimodal inference for the {text,image}
      // pair (NeuralQueryBuilder.java:914-919), else plain text inference
      val qv = sq.queryImage match {
        case Some(img) => graft.ml.ModelRegistry.current.embedMultimodal(sq.queryText.getOrElse(""), img, dim)
        case None      => graft.ml.ModelRegistry.current.embedDense(sq.queryText.getOrElse(""), dim)
      }
      // expand_nested: score every chunk of the semantic target, keep the
      // per-document max (reference wraps the knn query in nested/
      // ScoreMode.Max, NeuralQueryBuilder.java:786-787,828-829). A row-local
      // HOF (transform + array_max) — no explode/groupBy, stays inside
      // whole-stage codegen.
      val sc =
        if (sq.expandNested.contains(true)) {
          val chunks = sq.vecCol.map(col)
            .getOrElse(col(s"${sq.field}_semantic_info.chunks"))
          round(array_max(transform(chunks,
            c => VectorExpressions.dense_cosine(c.getField("embedding"), typedLit(qv)))), 6)
        } else {
          val docVec = sq.vecCol.map(col).getOrElse(Enrich.embedUdf(dim)(col(sq.field)))
          round(VectorExpressions.dense_cosine(docVec, typedLit(qv)), 6)
        }
      // radial cuts: below-threshold docs are non-matches for THIS subquery
      // (min_score; max_distance is the distance dual, d = 1 − cos)
      (sq.minScore, sq.maxDistance) match {
        case (Some(ms), _) => when(sc > 0.0 && sc >= ms, sc)
        case (_, Some(md)) => when(sc > 0.0 && sc >= 1.0 - md, sc)
        case _             => when(sc > 0.0, sc)
      }
    case "neural_sparse" =>
      // token priority per NeuralSparseQueryBuilder.getQueryTokens: raw
      // query_tokens > analyzer (tokens at weight 1.0) > model inference
      val q = sq.queryTokens.getOrElse {
        if (sq.analyzer.isDefined)
          HashEmbedder.tokenize(sq.queryText.getOrElse("")).distinct.map(_ -> 1.0f).toMap
        else graft.ml.ModelRegistry.current.encodeSparse(sq.queryText.getOrElse(""))
      }
      val docTokens = sq.tokensCol.map(col).getOrElse(Enrich.encodeUdf(col(sq.field)))
      val sc = round(VectorExpressions.sparse_dot(docTokens, typedLit(q)), 6)
      when(sc > 0.0, sc)
    case "match" =>
      // tf overlap against the query's token multiset (pinned lexical
      // scorer; corpus-wide idf needs a side aggregation — use
      // Lexical.matchScore for the idf-weighted form)
      val q = graft.ml.ModelRegistry.current.encodeSparse(sq.queryText.getOrElse(""))
      val docTokens = sq.tokensCol.map(col).getOrElse(Enrich.encodeUdf(col(sq.field)))
      val sc = round(VectorExpressions.sparse_dot(docTokens, typedLit(q)), 6)
      when(sc > 0.0, sc)
    case "term" =>
      when(col(sq.field) === sq.queryText.getOrElse(""), lit(1.0))
    case "range" =>
      // params packed as "gte..lt" in queryText for this compact surface
      val parts = sq.queryText.getOrElse("..").split("\\.\\.", -1)
      require(parts.length == 2,
        s"range params must be 'gte..lt' (either side may be empty), got: ${sq.queryText.getOrElse("")}")
      val Array(gte, lt) = parts
      val c1 = if (gte.nonEmpty) col(sq.field) >= gte else lit(true)
      val c2 = if (lt.nonEmpty) col(sq.field) < lt else lit(true)
      when(c1 && c2, lit(1.0))
    case "hybrid" =>
      throw new IllegalArgumentException(
        "hybrid query cannot be nested inside another hybrid query") // HybridQueryPhaseSearcher guard
    case other =>
      throw new IllegalArgumentException(s"unknown subquery kind: $other")
  }

  /** Compile and run a request against a corpus table. */
  def run(corpus: DataFrame, req0: QueryRequest, docId: String = "doc_id"): DataFrame = {
    // ---- semantic_field_search_analyzer rewrite --------------------------
    // The reference resolves the analyzer against the target field config at
    // rewrite time (NeuralQueryBuilder.rewriteQueryForSemanticField): on a
    // sparse-model semantic target the neural query becomes a token query
    // from the analyzer; on a dense/knn target the parameter is an error
    // (NeuralQueryValidationUtil.validateNeuralQueryForKnn).
    val req = req0.copy(subqueries = req0.subqueries.map { sq =>
      if (sq.kind == "neural" && sq.searchAnalyzer.isDefined) {
        val sparseTarget = req0.fieldSpecs.exists {
          case FieldSpec(n, s: FieldKind.Semantic) => n == sq.field && !s.dense
          case FieldSpec(n, _: FieldKind.Sparse)   => n == sq.field
          case _                                   => false
        }
        require(sparseTarget,
          "Target field is a KNN field using a dense model. " +
            "semantic_field_search_analyzer is not supported since it is for the sparse model.")
        sq.copy(kind = "neural_sparse", analyzer = sq.searchAnalyzer, searchAnalyzer = None)
      } else sq
    })
    HybridValidation.validate(
      req.subqueries.size, req.normalization, req.combination, req.paginationDepth)
    // ---- neural rescore dispatch (single-query body) ---------------------
    // rescore {oversample_factor}: quantized shortlist + exact re-rank
    // (NeuralQuery.topKWithRescore). The quantized codes are an ingest
    // artifact in a real deployment; derived here when the corpus lacks
    // them. Dense dim resolves from the field registry (knn_vector dim).
    req.subqueries match {
      case Seq(sq) if sq.kind == "neural" && sq.rescoreOversample.isDefined =>
        require(!sq.expandNested.contains(true),
          "rescore + expand_nested is not supported on the same neural query")
        val dim = req.fieldSpecs.collectFirst {
          case FieldSpec(n, FieldKind.Dense(d)) if n == sq.field => d
        }.getOrElse(HashEmbedder.DefaultDim)
        val qv = sq.queryImage match {
          case Some(img) => graft.ml.ModelRegistry.current.embedMultimodal(sq.queryText.getOrElse(""), img, dim)
          case None      => graft.ml.ModelRegistry.current.embedDense(sq.queryText.getOrElse(""), dim)
        }
        val base = req.filterExpr.fold(corpus)(corpus.filter)
        // vector column: explicit vecCol > the field itself when registered
        // as a concrete knn_vector column > on-the-fly inference fallback
        val isVectorField = req.fieldSpecs.exists {
          case FieldSpec(n, _: FieldKind.Dense) => n == sq.field
          case _                                => false
        }
        val (withVec, vecCol) = sq.vecCol match {
          case Some(v)              => (base, v)
          case None if isVectorField => (base, sq.field)
          case None => (base.withColumn("__vec", Enrich.embedUdf(dim)(col(sq.field))), "__vec")
        }
        val quant = NeuralQuery.quantizeDense(withVec, vecCol, "__vec_q8")
        return NeuralQuery.topKWithRescore(quant, qv, vecCol, "__vec_q8",
          req.k, sq.rescoreOversample.get, docId)
      case _ => ()
    }
    // ---- neural_sparse method_parameters dispatch ------------------------
    // {top_n, k, heap_factor} engage the SEISMIC ANN search when the target
    // field is SEISMIC-indexed; otherwise the reference falls back to the
    // plain sparse query and the parameters are dropped
    // (SparseAnnQueryBuilder wraps a NeuralSparseQueryBuilder fallback).
    req.subqueries match {
      case Seq(sq) if sq.kind == "neural_sparse" &&
          (sq.methodTopN.isDefined || sq.methodK.isDefined || sq.methodHeapFactor.isDefined) &&
          graft.model.SemanticSchema.seismicFields(req.fieldSpecs).contains(sq.field) =>
        val q = sq.queryTokens.getOrElse {
          if (sq.analyzer.isDefined)
            HashEmbedder.tokenize(sq.queryText.getOrElse("")).distinct.map(_ -> 1.0f).toMap
          else graft.ml.ModelRegistry.current.encodeSparse(sq.queryText.getOrElse(""))
        }
        val base = req.filterExpr.fold(corpus)(corpus.filter)
        val scored = sq.tokensCol match {
          case Some(_) => base
          case None    => base.withColumn("__tokens", Enrich.encodeUdf(col(sq.field)))
        }
        val tokensCol = sq.tokensCol.getOrElse("__tokens")
        val idx = req.seismicIndex.getOrElse(
          graft.seismic.Seismic.build(scored, docId = docId, tokens = tokensCol))
        return graft.seismic.Seismic.search(idx, scored, q,
          k = sq.methodK.getOrElse(req.k),
          topN = sq.methodTopN.getOrElse(10),
          heapFactor = sq.methodHeapFactor.getOrElse(1.0f),
          docId = docId, tokens = tokensCol)
      case _ => ()
    }
    // ---- two-phase processor guards + cascade dispatch -------------------
    // NeuralSparseTwoPhaseProcessor.java:110-116 rejects non-score sorts
    // (the rescore window is meaningless when collection order is not by
    // score) and :254-267 rejects SEISMIC target fields (the ANN index has
    // its own pruned traversal — splitting its tokens would search a
    // different index than the one built).
    req.twoPhase.filter(_.enabled).foreach { tp =>
      require(req.sortFields.isEmpty,
        "neural_sparse_two_phase_processor does not support non-score sort")
      val seismic = graft.model.SemanticSchema.seismicFields(req.fieldSpecs)
      val targets = req.subqueries.filter(_.kind == "neural_sparse")
      targets.foreach { sq =>
        require(!seismic.contains(sq.field),
          s"neural_sparse_two_phase_processor is not supported on SEISMIC field [${sq.field}]")
      }
      require(targets.size == 1 && req.subqueries.size == 1,
        "two-phase processor supported for a single neural_sparse query " +
          "(the reference's IT coverage); drop the processor for hybrid bodies")
    }
    req.twoPhase.filter(_.enabled).foreach { tp =>
      require(req.collapseField.isEmpty,
        "two-phase processor + collapse is not supported (drop one)")
      val sq = req.subqueries.head
      // token priority identical to scoreColumn (NeuralSparseQueryBuilder
      // .getQueryTokens): raw query_tokens > analyzer (weight 1.0) > model
      // inference — the processor is a pure optimization and must not
      // change which token map the query scores with
      val q = sq.queryTokens.getOrElse {
        if (sq.analyzer.isDefined)
          HashEmbedder.tokenize(sq.queryText.getOrElse("")).distinct.map(_ -> 1.0f).toMap
        else graft.ml.ModelRegistry.current.encodeSparse(sq.queryText.getOrElse(""))
      }
      // the request's other clauses apply around the cascade exactly as on
      // the hybrid path: filter below scoring, post_filter/min_score on the
      // result, from/size pagination last
      val base = req.filterExpr.fold(corpus)(corpus.filter)
      val scored = sq.tokensCol match {
        case Some(_) => base
        case None    => base.withColumn("__tokens", Enrich.encodeUdf(col(sq.field)))
      }
      val tokensCol = sq.tokensCol.getOrElse("__tokens")
      // window sized to cover the full requested page
      val cascade = graft.sparse.SparseRetrieval.twoPhaseTopK(
        scored, q, req.from + req.k, tp.pruneRatio, tp.expansionRate,
        tp.maxWindowSize, docId, tokensCol,
        graft.functions.PruneUtils.pruneType(tp.pruneType))
      val postFiltered = req.postFilterExpr match {
        case Some(e) => cascade.join(
          corpus.filter(e).select(col(docId).as("doc_id")), Seq("doc_id"), "left_semi")
        case None => cascade
      }
      val floored = req.minScore match {
        case Some(ms) => postFiltered.where(col("score") >= ms)
        case None     => postFiltered
      }
      val paged =
        if (req.from > 0)
          floored
            .withColumn("__rn", row_number().over(
              org.apache.spark.sql.expressions.Window
                .orderBy(col("score").desc, col("doc_id").asc)))
            .where(col("__rn") > req.from).drop("__rn")
        else floored
      return paged.orderBy(col("score").desc, col("doc_id").asc).limit(req.k)
    }
    // the hybrid filter param is pushed below scoring into every subquery
    // (HybridQueryBuilder.java:117-128) — in Spark, one filter on the scan
    val filtered = req.filterExpr.fold(corpus)(corpus.filter)
    val scored = HybridPipeline.score(
      filtered, col(docId), req.subqueries.map(scoreColumn(_)), req.queryId)
    // per-subquery k (neural candidate depth) maps onto the shared
    // candidate cut when no explicit pagination_depth was given — the
    // per-subquery K-heap is uniform in the hybrid pipeline
    val pd = req.paginationDepth.orElse {
      val ks = req.subqueries.flatMap(_.k)
      if (ks.nonEmpty) Some(ks.max) else None
    }
    val collapse = req.collapseField.map { f =>
      (filtered.select(col(docId).as("doc_id"), col(f).as("collapse_key")),
        req.collapseDocsPerGroup)
    }
    // post_filter evaluates on the UNFILTERED corpus (it is independent of
    // the hybrid `filter` param) and restricts hits only after combination
    val postFilter = req.postFilterExpr.map(e =>
      corpus.filter(e).select(col(docId).as("doc_id")))
    // ---- field-sorted routing (HybridTopFieldDocSortCollector) -----------
    // A body `sort` collects by the sort key instead of the score; a body
    // `search_after` resumes below the cursor (PagingFieldCollector). The
    // reference rejects from+search_after together; collapse/min_score/
    // post_filter on the sorted path are out of this compiler's scope —
    // fail loud, never silently rank by score.
    if (req.sortFields.nonEmpty) {
      require(req.collapseField.isEmpty && req.minScore.isEmpty &&
        req.postFilterExpr.isEmpty && !req.explain,
        "sort composes with from/size/search_after only (collapse/min_score/post_filter/explain unsupported on the sorted path)")
      val sortKeys = filtered.select(
        (col(docId).as("doc_id") +: req.sortFields.map(f => col(f.field))): _*)
      req.searchAfter match {
        case None =>
          return HybridPipeline.runSortedFields(scored, req.subqueries.size,
            req.normalization, req.combination, sortKeys, req.sortFields,
            pd, req.from, req.k)
        case Some(cursor) =>
          require(req.from == 0, "search_after cannot be combined with from")
          require(cursor.length == req.sortFields.length + 1,
            s"search_after arity ${cursor.length} != sort fields ${req.sortFields.length} + doc_id")
          val window = pd.getOrElse(HybridLimits.MaxResultWindow)
          // the page draws from EVERY combined candidate (the k-cut is the
          // only depth limit) — size covers the union of per-subquery cuts,
          // else a deep cursor would silently lose its tail
          val base = HybridPipeline.runSortedFields(scored, req.subqueries.size,
            req.normalization, req.combination, sortKeys, req.sortFields,
            Some(window), 0, window * req.subqueries.size)
            .drop("rank")
            .join(sortKeys, Seq("doc_id"))
          return HybridPipeline.searchAfterFields(base, req.sortFields,
            cursor.init, toDocId(cursor.last), req.k)
            .select(col("query_id"), col("doc_id"), col("score"))
      }
    }
    req.searchAfter.foreach { cursor => // score-sorted cursor: [score, doc_id]
      require(req.from == 0, "search_after cannot be combined with from")
      require(cursor.length == 2,
        s"score-sorted search_after must be [score, doc_id], got arity ${cursor.length}")
      require(req.collapseField.isEmpty && req.minScore.isEmpty &&
        req.postFilterExpr.isEmpty && !req.explain,
        "search_after composes with size only on this compiler")
      val window = pd.getOrElse(HybridLimits.MaxResultWindow)
      // The cursor a client resends is the EMITTED score — round(score, 4),
      // the precision every query surface displays. Comparing it to the raw
      // internal double with exact equality never matches, so tie rows at
      // the cursor score are skipped or re-served. Quantize the internal
      // score to the emitted precision first: predicate, tie-break order,
      // and the displayed value then agree by construction.
      val base = HybridPipeline.run(scored, req.subqueries.size,
        req.normalization, req.combination, Some(window), 0,
        window * req.subqueries.size)
        .withColumn("score", round(col("score"), 4))
      val after = cursor.head match {
        case d: Double => d
        case l: Long   => l.toDouble
        case i: Int    => i.toDouble
        case other => throw new IllegalArgumentException(s"cursor score must be numeric, got $other")
      }
      val afterQ = BigDecimal(after).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      return HybridPipeline.searchAfter(base.drop("rank"), afterQ, toDocId(cursor.last), req.k)
    }
    if (req.explain)
      Explain.runWithExplain(scored, req.subqueries.size, req.normalization,
        req.combination, pd, req.from, req.k, req.minScore, collapse, postFilter)
    else
      HybridPipeline.run(scored, req.subqueries.size, req.normalization,
        req.combination, pd, req.from, req.k, req.minScore, collapse, postFilter)
  }

  private def toDocId(v: Any): Long = v match {
    case l: Long   => l
    case i: Int    => i.toLong
    case s: String => s.toLong
    case other => throw new IllegalArgumentException(
      s"search_after doc_id tie-break must be integral, got $other")
  }

  /** Natural-language entry: translate (agentic path) → enrich → compile. */
  def runNaturalLanguage(corpus: DataFrame, question: String,
      queryFields: Seq[String], translator: QueryTranslator = RuleBasedTranslator,
      defaultModelId: Option[String] = Some("hash-embedder"),
      k: Int = HybridLimits.DefaultK): DataFrame = {
    val subs = NeuralQueryEnricher.enrich(
      translator.translate(question, queryFields), defaultModelId)
    run(corpus, QueryRequest(subqueries = subs, k = k))
  }

  /** `agentic_context` response extension (processor/
    * AgenticContextResponseProcessor.java:52-101): attach the agent's steps
    * summary and translated DSL query to the response. The reference adds
    * one AgentStepsSearchExtBuilder ext section per response; the
    * relational (cross-engine-hashable) encoding is a constant column per
    * hit row, null when the corresponding include flag is off — with both
    * flags off AND no memory id the processor's no-attribute branch returns
    * the response unchanged, so this returns `hits` as-is. memory_id rides
    * along UNGATED by the include flags (the processor reads it
    * unconditionally, AgenticContextResponseProcessor.java:64) and is
    * omitted entirely when absent, matching the null-skip branch. */
  def attachAgentContext(hits: DataFrame, subs: Seq[SubquerySpec],
      k: Int = HybridLimits.DefaultK,
      includeAgentSteps: Boolean = true,
      includeDslQuery: Boolean = true,
      memoryId: Option[String] = None): DataFrame = {
    if (!includeAgentSteps && !includeDslQuery && memoryId.isEmpty) return hits
    val steps =
      if (includeAgentSteps) lit(AgentContext.stepsSummary(subs))
      else lit(null).cast("string")
    val dsl =
      if (includeDslQuery) lit(AgentContext.dslQuery(subs, k))
      else lit(null).cast("string")
    val out = hits.withColumn("agent_steps", steps).withColumn("dsl_query", dsl)
    memoryId.fold(out)(m => out.withColumn("memory_id", lit(m)))
  }
}
