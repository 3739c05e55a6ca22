package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query-set scaling harness: hold the corpus FIXED (sf0.1) and sweep the
  * NUMBER OF QUERIES each batch serving shape answers in one plan — the
  * axis the per-corpus curves never measure. The "query-set-at-a-time"
  * claim is that batch cost is ~one corpus pass plus per-query work, i.e.
  * per-query cost FALLS (or at worst stays flat) as the batch grows;
  * per-query cost RISING with batch size is the super-linear step the
  * round-9 verdict asked to be measured.
  *
  * Query sets derive deterministically from the corpus itself:
  *   - sparse/seismic/hybrid: query i = the top `QTokens` tokens (by
  *     weight desc, token asc) of doc i's token map — realistic weights,
  *     disjoint-ish vocabularies, reproducible across runs;
  *   - dense (IVF): query i = embedding vector (i mod nVecs), distinct
  *     query_ids (duplicate vectors exercise the batch machinery, not the
  *     candidate geometry).
  *
  * Shapes measured:
  *   - sparse_batch:    SparseRetrieval.batchTopK (postings ⨝ broadcast)
  *   - seismic_batch:   Seismic.searchBatch (index walk, windowed θ)
  *   - ann_ivf_batch:   Ann.ivfTopKBatch (probed-cell union scan)
  *   - hybrid_rel:      HybridPipeline.scoreBatchSparse → run (ONE
  *                      postings join for the whole batch)
  *   - hybrid_union:    the per-query score() union — one corpus SCAN per
  *                      query, the contrast shape (capped at `unionCap`
  *                      queries: beyond that the plan itself is the cost)
  *
  * Usage: runMain graft.QsetBench [nqs=10,100,1000] [passes=3] [unionCap=100]
  * Writes /tmp/graftscale/scale_results_qset.json.
  */
object QsetBench {

  private val QTokens = 5

  def main(args: Array[String]): Unit = {
    def argOf(key: String, dflt: String): String =
      args.find(_.startsWith(key + "=")).map(_.stripPrefix(key + "=")).getOrElse(dflt)
    val nqs = argOf("nqs", "10,100,1000").split(",").map(_.trim.toInt).toSeq
    val passes = argOf("passes", "3").toInt
    val unionCap = argOf("unionCap", "100").toInt
    // chunks=500,1000,2000 adds a hybrid_rel variant per chunkSize — the
    // r11 verdict's ask: the 1000 default was asserted, not swept
    val chunks = argOf("chunks", "").split(",")
      .map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new ScaleBench.MetricsListener
    spark.sparkContext.addSparkListener(metrics)

    // ingest-time artifacts, built once (the serving posture: queries are
    // measured against standing indexes)
    val docs = SparkEntry.docsWithTokens(spark, srcDir)
    docs.count()
    val postings = graft.sparse.SparseRetrieval.buildPostings(docs).persist()
    postings.count()
    val seismicIdx = SparkEntry.seismicTruncIndex(spark, srcDir)
    seismicIdx.clusters.count()
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val centroids = graft.ann.Ann.seededCentroids(nlist = 8, dim = 64)
    val assigned = graft.ann.Ann.assign(emb, centroids, roundDp = 6).persist()
    assigned.count()

    // deterministic query sets from the corpus
    val maxNq = nqs.max
    val docTok = docs.select(col("doc_id"), col("tokens"))
      .orderBy(col("doc_id")).limit(maxNq).collect()
      .map(r => (r.getLong(0), r.getMap[String, Float](1)))
    def sparseQ(nq: Int): Map[Long, Map[String, Float]] =
      (0 until nq).map { i =>
        // wrap past the corpus like denseQ: query i = doc (i mod nDocs),
        // distinct query_ids (a batch larger than the corpus exercises the
        // batch machinery, not new geometry)
        val m = docTok(i % docTok.length)._2
        i.toLong -> m.toSeq.sortBy { case (t, w) => (-w, t) }.take(QTokens).toMap
      }.toMap
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).collect()
      .map(_.getSeq[Float](1).toArray)
    def denseQ(nq: Int): Map[Long, Array[Float]] =
      (0 until nq).map(i => i.toLong -> vecs(i % vecs.length)).toMap

    import graft.exec.HybridPipeline
    import graft.model.{NormalizationSpec, CombinationSpec}
    def hybridSubs(nq: Int): Map[Long, Seq[Map[String, Float]]] = {
      val q = sparseQ(nq)
      q.map { case (qid, m) => qid -> Seq(m, q(((qid + 1) % nq))) }
    }
    def shapes(nq: Int): Seq[(String, () => DataFrame)] = Seq(
      "sparse_batch" -> (() =>
        graft.sparse.SparseRetrieval.batchTopK(postings, sparseQ(nq), k = 10)),
      "seismic_batch" -> (() =>
        graft.seismic.Seismic.searchBatch(seismicIdx, docs, sparseQ(nq),
          k = 10, topN = 3, heapFactor = 2.0f)),
      "ann_ivf_batch" -> (() =>
        graft.ann.Ann.ivfTopKBatch(assigned, centroids, denseQ(nq), k = 10, nprobe = 4)),
      "hybrid_rel" -> (() =>
        HybridPipeline.run(
          HybridPipeline.scoreBatchSparse(postings, hybridSubs(nq)), 2,
          NormalizationSpec.MinMax(), CombinationSpec.ArithmeticMean(),
          paginationDepth = Some(100), size = 10))
    ) ++ chunks.map { cs =>
      s"hybrid_rel_c$cs" -> (() =>
        HybridPipeline.run(
          HybridPipeline.scoreBatchSparse(postings, hybridSubs(nq),
            chunkSize = cs), 2,
          NormalizationSpec.MinMax(), CombinationSpec.ArithmeticMean(),
          paginationDepth = Some(100), size = 10))
    } ++ (if (nq > unionCap) Seq.empty else Seq(
      "hybrid_union" -> (() => {
        val subs = hybridSubs(nq)
        val scored = subs.toSeq.sortBy(_._1).map { case (qid, ss) =>
          HybridPipeline.score(docs, col("doc_id"),
            ss.map { m =>
              val sc = round(
                graft.functions.VectorExpressions.sparse_dot(col("tokens"), typedLit(m)), 6)
              when(sc > 0.0, sc)
            }, queryId = qid)
        }.reduce(_ unionByName _)
        HybridPipeline.run(scored, 2, NormalizationSpec.MinMax(),
          CombinationSpec.ArithmeticMean(), paginationDepth = Some(100), size = 10)
      })))

    val results = scala.collection.mutable.LinkedHashMap.empty[(String, Int), (Double, Map[String, Long])]
    nqs.foreach { nq =>
      // warmup pass
      shapes(nq).foreach { case (name, mk) =>
        try mk().write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[qset] warmup $name nq=$nq: ${e.getMessage}") }
      }
      val byPass = (1 to passes).map { _ =>
        shapes(nq).map { case (name, mk) =>
          metrics.reset()
          val t0 = System.nanoTime()
          try mk().write.format("noop").mode("overwrite").save()
          catch { case e: Throwable => System.err.println(s"[qset] $name nq=$nq: ${e.getMessage}") }
          val dt = (System.nanoTime() - t0) / 1e9
          name -> (dt, metrics.snapshot())
        }.toMap
      }
      shapes(nq).foreach { case (name, _) =>
        val ts = byPass.map(_(name)._1).sorted
        val med = ts(passes / 2)
        val phys = byPass.head(name)._2.keys.map { k =>
          val vs = byPass.map(_(name)._2(k)).sorted
          k -> vs(passes / 2)
        }.toMap
        results((name, nq)) = (med, phys)
        println(f"[qset] nq=$nq%-5d $name%-14s $med%7.2fs  ${med / nq * 1000}%8.2f ms/query")
      }
    }

    val names = results.keys.map(_._1).toSeq.distinct
    val lines = names.map { name =>
      val cells = nqs.flatMap { nq =>
        results.get((name, nq)).map { case (t, phys) =>
          val physStr = phys.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")
          s""""nq$nq":{"sec":$t,"ms_per_query":${t / nq * 1000},"phys":{$physStr}}"""
        }
      }
      s""""$name":{${cells.mkString(",")}}"""
    }
    val gitHash =
      try {
        val p = new ProcessBuilder("git", "rev-parse", "--short", "HEAD")
          .directory(new java.io.File(".")).start()
        val h = new String(p.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim
        p.waitFor(); if (h.nonEmpty) h else "unknown"
      } catch { case _: Throwable => "unknown" }
    val roundEnv = sys.env.getOrElse("SPARK_GRAFT_ROUND", "")
    val roundStamp = if (roundEnv.nonEmpty) s""","round":$roundEnv""" else ""
    val json = s"""{"mode":"qset","src":"$srcDir","git":"$gitHash"$roundStamp,"nqs":[${nqs.mkString(",")}],"queries":{${lines.mkString(",")}}}"""
    println(json)
    val out = "/tmp/graftscale/scale_results_qset.json"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("/tmp/graftscale"))
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[qset] wrote $out")
    spark.stop()
  }
}
