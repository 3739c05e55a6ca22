package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.exec.{HybridPipeline, NeuralQuery, QueryCompiler}
import graft.functions.VectorExpressions
import graft.ingest.Enrich
import graft.model._

/** Round-3 operator coverage: post_filter, collapse inner hits,
  * per-subquery collapse, max_distance, enriched-compiler path,
  * skew-capped ngram, schema derivation, two-phase DSL guards. */
class Round3Spec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "spark join table fast", "en", 120),
    (2L, "slow scan big table join", "en", 300),
    (3L, "spark spark stream window", "de", 80),
    (4L, "unrelated words entirely here", "en", 500),
    // doc 5 (de) is the max-scoring doc of the "spark join" subquery, so a
    // PRE-scoring lang filter shifts the min_max statistics observably
    (5L, "spark join spark join fast", "de", 150)
  ).toDF("doc_id", "text", "lang", "n_chars")

  private def scored = {
    val docs = corpus.withColumn("tokens", Enrich.encodeUdf(col("text")))
    def sub(t: String) = {
      val q = graft.ml.HashEmbedder.encode(t)
      val sc = round(VectorExpressions.sparse_dot(col("tokens"), typedLit(q)), 6)
      when(sc > 0.0, sc)
    }
    HybridPipeline.score(docs, col("doc_id"), Seq(sub("spark join"), sub("table scan")))
  }

  test("post_filter restricts hits WITHOUT changing normalization stats") {
    val unfiltered = HybridPipeline.run(scored, 2,
      NormalizationSpec.MinMax(), CombinationSpec.ArithmeticMean(),
      paginationDepth = Some(10)).collect()
    val post = HybridPipeline.run(scored, 2,
      NormalizationSpec.MinMax(), CombinationSpec.ArithmeticMean(),
      paginationDepth = Some(10),
      postFilter = Some(corpus.where(col("lang") === "en").select(col("doc_id")))).collect()
    val enIds = Set(1L, 2L, 4L)
    assert(post.forall(r => enIds.contains(r.getAs[Long]("doc_id"))))
    // post_filter semantics: surviving docs keep the score they had in the
    // UNFILTERED run (normalization over the full candidate set)...
    val unfScores = unfiltered.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    post.foreach(r => assert(r.getAs[Double]("score") == unfScores(r.getAs[Long]("doc_id"))))
    // ...whereas a PRE-scoring filter re-normalizes over en docs only and
    // must diverge (different min/max ⇒ different scores) — the two filter
    // forms are observably different operators
    val preScored = {
      val docs = corpus.where(col("lang") === "en")
        .withColumn("tokens", Enrich.encodeUdf(col("text")))
      def sub(t: String) = {
        val q = graft.ml.HashEmbedder.encode(t)
        val sc = round(VectorExpressions.sparse_dot(col("tokens"), typedLit(q)), 6)
        when(sc > 0.0, sc)
      }
      HybridPipeline.score(docs, col("doc_id"), Seq(sub("spark join"), sub("table scan")))
    }
    val pre = HybridPipeline.run(preScored, 2,
      NormalizationSpec.MinMax(), CombinationSpec.ArithmeticMean(),
      paginationDepth = Some(10)).collect()
    val preScores = pre.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(preScores.exists { case (id, s) => unfScores.get(id).exists(_ != s) })
  }

  test("collapse inner hits: reps are group tops, inner rows rank within group") {
    val keys = corpus.select(col("doc_id"), col("lang").as("collapse_key"))
    val out = HybridPipeline.runCollapseInnerHits(scored, 2,
      NormalizationSpec.MinMax(), CombinationSpec.ArithmeticMean(),
      keys, innerSize = 2, paginationDepth = Some(10)).collect()
    // one representative per collapse key
    val reps = out.map(r => (r.getAs[String]("collapse_key"), r.getAs[Long]("doc_id"))).distinct
    assert(reps.groupBy(_._1).forall(_._2.length == 1))
    // every inner hit belongs to its representative's group and inner_rank 1
    // IS the representative
    out.filter(_.getAs[Int]("inner_rank") == 1).foreach { r =>
      assert(r.getAs[Long]("inner_doc_id") == r.getAs[Long]("doc_id"))
      assert(r.getAs[Double]("inner_score") == r.getAs[Double]("score"))
    }
    // at most innerSize inner hits per group
    assert(out.groupBy(r => r.getAs[String]("collapse_key")).forall(_._2.length <= 2))
  }

  test("per-subquery collapse bounds each subquery's contribution per key") {
    val keys = corpus.select(col("doc_id"), col("lang").as("collapse_key"))
    val collapsed = HybridPipeline.perSubqueryCollapse(scored, keys, 1).collect()
    // per (subq, key): exactly the top-1 row survives
    val byGroup = collapsed.groupBy { r =>
      (r.getAs[Int]("subq"), r.getAs[Long]("doc_id") match {
        case 3L | 5L => "de"
        case _       => "en"
      })
    }
    assert(byGroup.forall(_._2.length == 1))
    // and the survivor is the max-score doc of its group in the raw relation
    val raw = scored.collect().map(r =>
      (r.getAs[Int]("subq"), r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    byGroup.foreach { case ((subq, lang), rows) =>
      val ids = if (lang == "de") Set(3L, 5L) else Set(1L, 2L, 4L)
      val best = raw.filter(t => t._1 == subq && ids.contains(t._2))
        .sortBy(t => (-t._3, t._2)).head
      assert(rows.head.getAs[Long]("doc_id") == best._2)
    }
  }

  test("max_distance radial is the distance dual of min_score") {
    val s = NeuralQuery.scoreByText(corpus, "spark join fast", "text")
      .select(col("doc_id"), col("score"))
    val byDist = NeuralQuery.radialMaxDistance(s, 0.5)
      .select(col("doc_id")).as[Long].collect().toSet
    val byScore = NeuralQuery.radial(s, 0.5)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(byDist == byScore) // d ≤ 0.5 ⇔ score ≥ 0.5 for d = 1 − score
    assert(byDist.nonEmpty)
  }

  test("enriched compiler path: no inference UDF in the plan, same results") {
    // materialize the enrichment like production does (ingest writes
    // parquet) — a lazily-enriched frame would still carry the ingest UDFs
    // in ITS plan, which is not what the query-time assertion is about
    val tmp = java.nio.file.Files.createTempDirectory("graft_enriched").toString
    corpus
      .withColumn("tokens", Enrich.encodeUdf(col("text")))
      .withColumn("emb", Enrich.embedUdf(graft.ml.HashEmbedder.DefaultDim)(col("text")))
      .write.mode("overwrite").parquet(tmp)
    val enriched = spark.read.parquet(tmp)
    val subsInfer = Seq(
      SubquerySpec("neural", "text", queryText = Some("spark join fast")),
      SubquerySpec("neural_sparse", "text", queryText = Some("spark join fast")))
    val subsEnriched = Seq(
      SubquerySpec("neural", "text", queryText = Some("spark join fast"), vecCol = Some("emb")),
      SubquerySpec("neural_sparse", "text", queryText = Some("spark join fast"), tokensCol = Some("tokens")))
    val a = QueryCompiler.run(corpus, QueryCompiler.QueryRequest(subqueries = subsInfer))
    val b = QueryCompiler.run(enriched, QueryCompiler.QueryRequest(subqueries = subsEnriched))
    assert(a.collect().map(_.toString).toSeq == b.collect().map(_.toString).toSeq)
    // the enriched plan must carry NO ScalaUDF (inference) anywhere —
    // at 100 TB a query-time embed UDF re-infers the whole corpus
    def hasUdf(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.exists(p => p.expressions.exists(e =>
        e.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF])))
    assert(hasUdf(a))
    assert(!hasUdf(b))
  }

  test("ngram skew cap: stop-shingle corpus keeps recall, drops hot bucket") {
    // every doc shares the same stop prefix (one hot shingle family);
    // near-dup pairs additionally share rare discriminative shingles
    val stop = "the quick brown fox says"
    val docs = (1L to 8L).map { i =>
      val tail = if (i % 2 == 0) s"unique pair content $i ${i - 1} shared tail words here"
      else s"unique pair content ${i + 1} $i shared tail words here"
      (i, s"$stop $tail")
    }.toDF("doc_id", "text")
    // at a near-dup threshold (0.8) only the identical pairs qualify, and
    // those share RARE shingles — the cap costs no recall; a cap of 4
    // drops the df=8 stop-prefix shingles from candidate generation
    val uncapped = Dedup.ngramJaccardPairs(docs, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = Dedup.ngramJaccardPairs(docs, threshold = 0.8, maxDf = Some(4))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == uncapped)
    assert(uncapped == Set((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)))
    // and the emitted jaccard is computed on FULL sets (identical values)
    val jU = Dedup.ngramJaccardPairs(docs, threshold = 0.8)
      .orderBy("id_a", "id_b").select("jaccard").as[Double].collect().toSeq
    val jC = Dedup.ngramJaccardPairs(docs, threshold = 0.8, maxDf = Some(4))
      .orderBy("id_a", "id_b").select("jaccard").as[Double].collect().toSeq
    assert(jU == jC)
  }

  test("prefix-filtered ngram ≡ exact join, including stop-shingle-only overlaps") {
    // mixed corpus: boilerplate-heavy docs (hot shingles), near-dup pairs,
    // AND a pair whose entire overlap is the corpus-hot boilerplate — the
    // case the maxDf cap drops but prefix filtering must keep (exact recall)
    val boiler = "all rights reserved standard footer terms apply here"
    val docs = ((1L to 8L).map { i =>
      val tail = if (i % 2 == 0) s"unique pair content $i ${i - 1} shared tail words"
      else s"unique pair content ${i + 1} $i shared tail words"
      (i, s"$tail $boiler")
    } ++ Seq(
      (20L, boiler),            // overlap with 21 is ONLY hot shingles
      (21L, boiler),
      (22L, "completely different text with no shingle overlap at all whatsoever")
    )).toDF("doc_id", "text")
    for (tau <- Seq(0.3, 0.5, 0.8)) {
      val exact = Dedup.ngramJaccardPairs(docs, threshold = tau)
        .orderBy("id_a", "id_b")
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSeq
      val prefix = Dedup.ngramJaccardPairsPrefix(docs, threshold = tau)
        .orderBy("id_a", "id_b")
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSeq
      assert(prefix == exact, s"tau=$tau")
    }
    // the hot-only pair exists and prefix finds it (maxDf=4 would not)
    val p5 = Dedup.ngramJaccardPairsPrefix(docs, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(p5.contains((20L, 21L)))
  }

  test("capped ngram under replication: all-hot duplicate groups stay dropped") {
    // stop phrase is corpus-hot (every doc); docs 20/21 are IDENTICAL and
    // all-hot (no rare shingle) — under the cap their pair is NOT a
    // candidate; docs 30/31 are identical WITH rare content — their pair
    // qualifies at jaccard 1.0. Brute reference computed per the capped
    // semantics (rare-shingle candidacy, full-set jaccard).
    val stop = "the quick brown fox jumps over it"
    val docs = Seq(
      (20L, stop), (21L, stop),
      (30L, s"$stop unique alpha beta gamma delta"),
      (31L, s"$stop unique alpha beta gamma delta"),
      (40L, s"$stop other content entirely different words")
    ).toDF("doc_id", "text")
    val cap = 4
    val got = Dedup.ngramJaccardPairs(docs, threshold = 0.3, maxDf = Some(cap))
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    // brute reference
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect()
    val shs = rows.map { case (id, tx) => id -> Dedup.shingles(tx, 3) }.toMap
    val dfm = shs.values.flatten.groupBy(identity).map { case (s, xs) => s -> xs.size }
    val rare = (s: String) => dfm(s) <= cap
    val expected = (for {
      (a, sa) <- shs.toSeq; (b, sb) <- shs.toSeq if a < b
      if sa.intersect(sb).exists(rare)
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= 0.3
    } yield (a, b, BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(got == expected)
    assert(!got.exists(p => p._1 == 20L && p._2 == 21L)) // all-hot pair dropped
    assert(got.contains((30L, 31L, 1.0)))                 // rare-bearing dup kept
  }

  test("prefix ngram ≡ exact join under verbatim replication (group collapse)") {
    // the duplication regime: every doc has 3 verbatim replicas — the
    // pre-collapse must expand within-group (jaccard 1.0) and cross-group
    // pairs to EXACTLY the uncapped relation
    val base = Seq(
      "alpha beta gamma delta epsilon zeta",
      "alpha beta gamma delta epsilon eta",   // near-dup of the first
      "totally different words over here now",
      "")                                      // empty docs replicate too
    val docs = base.zipWithIndex.flatMap { case (tx, i) =>
      (0 until 3).map(r => ((i * 3 + r).toLong, tx))
    }.toDF("doc_id", "text")
    for (tau <- Seq(0.4, 0.8, 1.0)) {
      val exact = Dedup.ngramJaccardPairs(docs, threshold = tau)
        .orderBy("id_a", "id_b")
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSeq
      val prefix = Dedup.ngramJaccardPairsPrefix(docs, threshold = tau)
        .orderBy("id_a", "id_b")
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSeq
      assert(prefix == exact, s"tau=$tau")
      assert(exact.count(_._3 == 1.0) >= 4 * 3, s"tau=$tau must see within-group pairs")
    }
  }

  test("prefix ngram ≡ exact join on random near-dup corpora (fuzz)") {
    val rnd = new scala.util.Random(6)
    val vocab = (0 until 40).map(i => s"w$i")
    val base = (0 until 30).map { _ =>
      (0 until (8 + rnd.nextInt(20))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // each base doc plus a mutated twin (drop/replace a few tokens)
    val docs = base.zipWithIndex.flatMap { case (tx, i) =>
      val toks = tx.split(" ")
      val mut = toks.map(t => if (rnd.nextInt(10) == 0) vocab(rnd.nextInt(vocab.size)) else t)
      Seq((i.toLong * 2, tx), (i.toLong * 2 + 1, mut.mkString(" ")))
    }.toDF("doc_id", "text")
    val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.4)
      .orderBy("id_a", "id_b")
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSeq
    val prefix = Dedup.ngramJaccardPairsPrefix(docs, threshold = 0.4)
      .orderBy("id_a", "id_b")
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSeq
    assert(prefix == exact)
    assert(exact.nonEmpty) // the corpus genuinely has near-dups
  }

  test("deriveSemanticSchema matches enrichBySpec output schema") {
    val specs = Seq(
      FieldSpec("text", FieldKind.Semantic(dim = 8, chunked = true, tokenLimit = 4)),
      FieldSpec("text", FieldKind.Dense(8)),
      FieldSpec("text", FieldKind.Sparse()))
    val out = Enrich.enrichBySpec(corpus, specs) // internally asserts schema equality
    assert(out.schema.fieldNames.contains("text_semantic_info"))
    assert(out.schema.fieldNames.contains("text_emb"))
    assert(out.schema.fieldNames.contains("text_tokens"))
    assert(out.count() == 5)
    // sparse semantic variant derives a map-typed embedding
    val sparseSem = SemanticSchema.deriveSemanticSchema(corpus.schema,
      Seq(FieldSpec("text", FieldKind.Semantic(dense = false))))
    assert(sparseSem("text_semantic_info").dataType.catalogString.contains("map<string,float>"))
    intercept[IllegalArgumentException] {
      SemanticSchema.deriveSemanticSchema(corpus.schema,
        Seq(FieldSpec("missing", FieldKind.Semantic())))
    }
  }

  test("two-phase DSL: parsed, executed, guarded") {
    val body = """{"query": {"neural_sparse": {"text": {"query_text": "spark join fast"}}}, "size": 3}"""
    val pipeline =
      """{"request_processors": [{"neural_sparse_two_phase_processor": {
        |  "two_phase_parameter": {"prune_ratio": 0.4}}}]}""".stripMargin
    val req = QueryDsl.parse(body, Some(pipeline))
    assert(req.twoPhase.exists(_.pruneRatio == 0.4f))
    // cascade result == exact top-k (window covers all matches here)
    val out = QueryCompiler.run(corpus, req).collect()
    val exact = graft.sparse.SparseRetrieval.exactTopK(
      corpus.withColumn("tokens", Enrich.encodeUdf(col("text"))),
      graft.ml.HashEmbedder.encode("spark join fast"), 3).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == exact.map(_.getAs[Long]("doc_id")).toSeq)
    // guard: SEISMIC target field rejected
    intercept[IllegalArgumentException] {
      QueryCompiler.run(corpus, req.copy(
        fieldSpecs = Seq(FieldSpec("text", FieldKind.Sparse(seismic = true)))))
    }
    // guard: non-score sort rejected
    val sortBody = """{"query": {"neural_sparse": {"text": {"query_text": "x"}}}, "sort": ["n_chars"]}"""
    intercept[IllegalArgumentException] {
      QueryCompiler.run(corpus, QueryDsl.parse(sortBody, Some(pipeline)))
    }
    // disabled processor: normal (non-cascade) path, no guard firing
    val disabled =
      """{"request_processors": [{"neural_sparse_two_phase_processor": {
        |  "enabled": false, "two_phase_parameter": {}}}]}""".stripMargin
    val reqD = QueryDsl.parse(body, Some(disabled))
    assert(QueryCompiler.run(corpus, reqD.copy(
      fieldSpecs = Seq(FieldSpec("text", FieldKind.Sparse(seismic = true))))).count() > 0)
  }

  test("native tokenizer ≡ HashEmbedder.tokenize (one semantics, two forms)") {
    // Lexical's codegen'd filter(split(lower…)) and the Scala tokenize
    // must agree on every input or lexical vs sparse scores silently
    // diverge (latent-trap flagged in VERDICT r02). Seeded fuzz over
    // whitespace-heavy strings + edge shapes.
    val rnd = new scala.util.Random(7L)
    val pieces = Seq("Spark", "JOIN", "  ", "\t", "\n", "a", "über", "x1",
      ".", "", " multi  space ", "MiXeD")
    val samples = Seq("", " ", "\t\n", "word") ++
      (1 to 200).map(_ => (0 to rnd.nextInt(8)).map(_ => pieces(rnd.nextInt(pieces.length))).mkString(rnd.nextInt(3) match {
        case 0 => " "; case 1 => ""; case _ => "\t"
      }))
    val df = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
    val native = df.select(col("id"),
        filter(split(lower(col("text")), "\\s+"), x => x =!= "").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(native(i.toLong) == graft.ml.HashEmbedder.tokenize(s).toList,
        s"tokenizer divergence on ${s.getBytes.mkString(",")}")
    }
  }

  test("brute embedding kernel gated by row ceiling") {
    val emb = Seq((1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    assert(Dedup.embeddingNearDupBrute(emb, threshold = 0.9).count() >= 1)
    intercept[IllegalArgumentException] {
      Dedup.embeddingNearDupBrute(emb, threshold = 0.9, maxRows = 2).collect()
    }
  }
}
