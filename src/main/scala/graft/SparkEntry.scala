package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.exec.HybridPipeline
import graft.functions.VectorExpressions._
import graft.ml.HashEmbedder
import graft.model._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with a DuckDB-equivalent `oracleSql` wherever the operator's
  * semantics are SQL-expressible (including the neural paths: the
  * deterministic HashEmbedder sparse encoding `1+ln(1+count)` is re-derived
  * in SQL CTEs, and dense query vectors are inlined as list literals).
  */
object SparkEntry {

  // ---------------------------------------------------------------- helpers

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Schema-adaptive events loader — the ONE place event time is read.
    * The testdata has shipped `events.ts` both as ns-int64 parquet
    * (readable only under the nanosAsLong legacy conf) and as
    * timestamp[us] (TIMESTAMP_NTZ in Spark 4). Normalize either to an
    * explicit `ts_ns: Long` column so every event-time operator — batch
    * and streaming — computes on one time axis. The session TZ is pinned
    * UTC everywhere (Verify/Bench/tests), so the NTZ→TIMESTAMP cast is
    * micros-exact; DuckDB's `epoch_ns(ts)` on the same parquet agrees. */
  private[graft] def eventsWithTsNs(spark: SparkSession, dir: String): DataFrame = {
    // harmless for µs fixtures; required to even READ the ns-int64 ones
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withTsNs(t(spark, dir, "events"))
  }

  /** Add `ts_ns: Long` derived from whatever type `ts` loaded as. Works on
    * batch and streaming frames alike (pure projection). */
  private[graft] def withTsNs(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    events.schema("ts").dataType match {
      case LongType => events.withColumn("ts_ns", col("ts"))
      case TimestampNTZType | TimestampType =>
        events.withColumn("ts_ns",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other (expected long ns or timestamp)")
    }
  }

  /** Ingest-time enrichment cache: the `tokens` and `emb` columns are
    * written ONCE at ingest in a real deployment (Enrich.sparseEncoding /
    * textEmbedding), not recomputed per query — memoize the enriched corpus
    * per (session, dir) so the 50+ driver-contract queries measure QUERY
    * cost, not re-ingest cost. */
  private val corpusCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private[graft] def docsWithTokens(spark: SparkSession, dir: String): DataFrame =
    corpusCache.computeIfAbsent((spark, dir), { case (s, d) =>
      t(s, d, "documents")
        .withColumn("tokens", encodeUdf(col("text")))
        .withColumn("emb", embedUdf(HashEmbedder.DefaultDim)(col("text")))
        .persist()
    })

  /** SEISMIC index memo: the reference builds its clustered sparse index at
    * INGEST time (sparse/algorithm/seismic builds on merge/flush), so index
    * construction is an ingest artifact like the token column above —
    * queries measure search cost against a built index. */
  private val seismicCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), graft.seismic.Seismic.SeismicIndex]()
  private[graft] def seismicIndex(spark: SparkSession, dir: String): graft.seismic.Seismic.SeismicIndex =
    seismicCache.computeIfAbsent((spark, dir), { case (s, d) =>
      graft.seismic.Seismic.build(docsWithTokens(s, d))
    })

  /** λ-truncated SEISMIC index (posting truncation below the min cluster
    * size ⇒ single-cluster-per-token, seeded-randomness-free build) — the
    * driver-gate variant whose whole search pipeline the DuckDB oracle
    * replicates (OracleGen.seismicSql). The default multi-cluster index
    * above stays invariant-tested in SeismicSpec. */
  private[graft] val SeismicTruncNPostings = 8
  private val seismicTruncCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), graft.seismic.Seismic.SeismicIndex]()
  private[graft] def seismicTruncIndex(spark: SparkSession, dir: String): graft.seismic.Seismic.SeismicIndex =
    seismicTruncCache.computeIfAbsent((spark, dir), { case (s, d) =>
      graft.seismic.Seismic.build(docsWithTokens(s, d), nPostings = SeismicTruncNPostings)
    })

  /** MLlib MinHashLSH index memo — same ingest-artifact argument as the
    * SEISMIC index above: LSH signatures + shingle-hash arrays are built
    * when documents are indexed; queries measure candidate-join + verify
    * cost against them. */
  private val mllibMinhashCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), graft.ml.MllibVectorizer.MinhashIndex]()
  private[graft] def mllibMinhashIndex(spark: SparkSession, dir: String): graft.ml.MllibVectorizer.MinhashIndex =
    mllibMinhashCache.computeIfAbsent((spark, dir), { case (s, d) =>
      graft.ml.MllibVectorizer.buildMinhashIndex(t(s, d, "documents"))
    })

  /** MLlib tf-idf index memo — fitted model + postings + norms built at
    * ingest (the fitted IDFModel is the bulk-indexing model artifact). */
  private val mllibTfIdfCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), graft.ml.MllibVectorizer.TfIdfIndex]()
  private[graft] def mllibTfIdfIndex(spark: SparkSession, dir: String): graft.ml.MllibVectorizer.TfIdfIndex =
    mllibTfIdfCache.computeIfAbsent((spark, dir), { case (s, d) =>
      graft.ml.MllibVectorizer.buildTfIdfIndex(t(s, d, "documents"))
    })

  /** Written-IVF-index memo — the PERSISTED form of the q_ann_ivf path:
    * assignments written `partitionBy(centroid_id)` to local disk and read
    * back, so an nprobe probe is Parquet PARTITION PRUNING (directory
    * pruning at the scan), not an in-memory filter — the scale mechanism
    * the index exists for, now on the oracle-gated/benched path (the
    * in-memory q_ann_ivf stays as the contrast). Built once per
    * (session, dir) like every ingest artifact; the on-disk path is
    * scoped by (pid, session identity hash), so parallel test/bench JVMs
    * never race on a write AND a second SparkSession in the same JVM never
    * overwrites parquet files a prior session's loaded relation still
    * scans. A JVM shutdown hook deletes the pid-scoped root so repeated
    * bench/verify processes don't accumulate indexes under java.io.tmpdir. */
  private val ivfIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (DataFrame, Array[Array[Float]])]()
  private[graft] val IvfNlist = 8
  private lazy val ivfTmpRoot: String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_${ProcessHandle.current().pid()}"
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(root))
    }))
    root
  }
  /** Fresh scratch directory under the pid-scoped [[ivfTmpRoot]] — the
    * streaming dedup gates need a NEW index + checkpoint per invocation
    * (the stream must start empty every run), and parking them here puts
    * them under the root's recursive shutdown-hook cleanup.
    * `deleteOnExit()` on a non-empty directory never deletes it, so the
    * old per-invocation `createTempDirectory` scratch accumulated
    * full-corpus postings and checkpoints in /tmp across bench passes
    * (ADVICE r11). */
  private[graft] def streamScratchDir(prefix: String): String = {
    val root = new java.io.File(s"$ivfTmpRoot/scratch")
    // purge the PREVIOUS invocation's scratch for this prefix too: Bench
    // runs each stream gate 4× per process, and four full-corpus
    // postings+checkpoint trees are pure disk/page-cache pressure (the
    // caller contract: a gate's returned relation is fully consumed before
    // the gate runs again — true for Bench's noop sink and Verify's write)
    Option(root.listFiles()).foreach(_.filter(_.getName.startsWith(prefix + "_"))
      .foreach { f =>
        def rm(x: java.io.File): Unit = {
          Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
        }
        rm(f)
      })
    val d = new java.io.File(
      s"$root/${prefix}_${java.util.UUID.randomUUID().toString.take(12)}")
    d.mkdirs()
    d.getAbsolutePath
  }

  /** Written-postings-index memo — the PERSISTED form of the sparse batch
    * path: postings written `partitionBy(bucket)` (token-hash buckets) so
    * a query batch's token set prunes the scan to its buckets — Parquet
    * partition pruning, the [[ivfIndex]] protocol on the sparse side. Same
    * (pid, session)-scoped tmp path + shutdown cleanup as the IVF index. */
  private val postingsIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private[graft] val PostingsBuckets = 64
  private[graft] def postingsIndex(spark: SparkSession, dir: String): DataFrame =
    postingsIndexCache.computeIfAbsent((spark, dir), { case (s, d) =>
      import graft.sparse.SparseRetrieval
      val path = s"$ivfTmpRoot/s${System.identityHashCode(s).toHexString}/postings_" +
        d.replaceAll("[^A-Za-z0-9._-]", "_")
      SparseRetrieval.writePostingsIndex(
        SparseRetrieval.buildPostings(docsWithTokens(s, d)), path, PostingsBuckets)
      SparseRetrieval.loadPostingsIndex(s, path)
    })

  /** Written minhash-dedup index memo — built once per (session, dir) over
    * the BASE split of the documents corpus (doc_id % 10 ≠ 7; the held-out
    * tenth is the gate's arriving delta). Same pid/session-scoped tmp path
    * + shutdown cleanup as [[ivfIndex]]; the memo holds only the path (the
    * relations are read per [[graft.dedup.MinhashIndex.deltaPairs]] call —
    * scans, never resident). */
  private val minhashIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()
  private[graft] def minhashIndexPath(spark: SparkSession, dir: String): String =
    minhashIndexCache.computeIfAbsent((spark, dir), { case (s, d) =>
      val path = s"$ivfTmpRoot/s${System.identityHashCode(s).toHexString}/minhash_" +
        d.replaceAll("[^A-Za-z0-9._-]", "_")
      graft.dedup.MinhashIndex.write(
        t(s, d, "documents").where(col("doc_id") % 10 =!= 7), path)
      path
    })

  /** COMPACTED-index memos for the q_dedup_*_delta_compacted gates: the
    * same base split arrives as one write plus two appends (real
    * append-file debris), then every multi-file leaf is merged
    * (maxFiles = 1). The build+compact cycle is INGEST work — the memo
    * rule ([[minhashIndexPath]]): it runs once per (session, dir) in
    * Bench's warmup pass, and the timed gate measures the delta search
    * against the compacted layout. */
  private val compactedIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), String]()
  private[graft] def compactedIndexPath(spark: SparkSession, dir: String,
      kind: String): String =
    compactedIndexCache.computeIfAbsent((spark, dir, kind), { case (s, d, k) =>
      val path = s"$ivfTmpRoot/s${System.identityHashCode(s).toHexString}/cmp${k}_" +
        d.replaceAll("[^A-Za-z0-9._-]", "_")
      val (base, splitCol) = k match {
        case "embedding" =>
          (t(s, d, "embeddings").where(col("vec_id") % 10 =!= 7), "vec_id")
        case _ =>
          (t(s, d, "documents").where(col("doc_id") % 10 =!= 7), "doc_id")
      }
      k match {
        case "minhash" =>
          graft.dedup.MinhashIndex.write(base.where(col(splitCol) % 3 === 0), path)
          (1 to 2).foreach(r => graft.dedup.MinhashIndex.append(
            base.where(col(splitCol) % 3 === r), path))
          graft.dedup.MinhashIndex.compact(s, path, maxFiles = 1)
        case "winnow" =>
          graft.dedup.WinnowIndex.write(base.where(col(splitCol) % 3 === 0), path,
            k = Queries12.WinnowK, w = Queries12.WinnowW)
          (1 to 2).foreach(r => graft.dedup.WinnowIndex.append(
            base.where(col(splitCol) % 3 === r), path))
          graft.dedup.WinnowIndex.compact(s, path, maxFiles = 1)
        case "embedding" =>
          graft.dedup.EmbeddingIndex.write(base.where(col(splitCol) % 3 === 0), path,
            dim = 64, nbits = 4, tables = 8)
          (1 to 2).foreach(r => graft.dedup.EmbeddingIndex.append(
            base.where(col(splitCol) % 3 === r), path))
          graft.dedup.EmbeddingIndex.compact(s, path, maxFiles = 1)
      }
      path
    })

  /** Written embedding near-dup index memo — base split of the embeddings
    * corpus (vec_id % 10 ≠ 7); parameters match q_dedup_embedding_lsh. */
  private val embeddingIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()
  private[graft] def embeddingIndexPath(spark: SparkSession, dir: String): String =
    embeddingIndexCache.computeIfAbsent((spark, dir), { case (s, d) =>
      val path = s"$ivfTmpRoot/s${System.identityHashCode(s).toHexString}/embidx_" +
        d.replaceAll("[^A-Za-z0-9._-]", "_")
      graft.dedup.EmbeddingIndex.write(
        t(s, d, "embeddings").where(col("vec_id") % 10 =!= 7), path,
        dim = 64, nbits = 4, tables = 8)
      path
    })

  /** Probe-scaled embedding index memo ([[graft.dedup.EmbeddingIndex
    * .writeScaled]]): one count() picks nbits so expected bucket population
    * stays ~[[Queries17.ScaledTarget]] per table — the production
    * configuration; the fixed-nbits memo above is kept as the deliberate
    * contrast (the semanticDedupAuto protocol). */
  private val embeddingScaledIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()
  private[graft] def embeddingScaledIndexPath(spark: SparkSession, dir: String): String =
    embeddingScaledIndexCache.computeIfAbsent((spark, dir), { case (s, d) =>
      val path = s"$ivfTmpRoot/s${System.identityHashCode(s).toHexString}/embsidx_" +
        d.replaceAll("[^A-Za-z0-9._-]", "_")
      graft.dedup.EmbeddingIndex.writeScaled(
        t(s, d, "embeddings").where(col("vec_id") % 10 =!= 7), path,
        dim = Queries17.ScaledDim, targetBucket = Queries17.ScaledTarget.toInt,
        minNbits = Queries17.ScaledMinNbits, maxNbits = Queries17.ScaledMaxNbits,
        tables = Queries17.ScaledTables, seed = Queries17.ScaledSeed)
      path
    })

  /** Written winnow-fingerprint index memo — same base split and hygiene
    * as [[minhashIndexPath]]; parameters match the q_dedup_winnow gates. */
  private val winnowIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()
  private[graft] def winnowIndexPath(spark: SparkSession, dir: String): String =
    winnowIndexCache.computeIfAbsent((spark, dir), { case (s, d) =>
      val path = s"$ivfTmpRoot/s${System.identityHashCode(s).toHexString}/winnow_" +
        d.replaceAll("[^A-Za-z0-9._-]", "_")
      graft.dedup.WinnowIndex.write(
        t(s, d, "documents").where(col("doc_id") % 10 =!= 7), path,
        k = Queries12.WinnowK, w = Queries12.WinnowW)
      path
    })

  private[graft] def ivfIndex(spark: SparkSession, dir: String): (DataFrame, Array[Array[Float]]) =
    ivfIndexCache.computeIfAbsent((spark, dir), { case (s, d) =>
      import graft.ann.Ann
      val path = s"$ivfTmpRoot/s${System.identityHashCode(s).toHexString}/" +
        d.replaceAll("[^A-Za-z0-9._-]", "_")
      val centroids = Ann.seededCentroids(nlist = IvfNlist, dim = 64)
      Ann.writeIndex(Ann.assign(t(s, d, "embeddings"), centroids, roundDp = 6),
        centroids, path)
      Ann.loadIndex(s, path)
    })

  /** Release every per-(session, dir) ingest memo. ScaleBench measures
    * several corpus dirs in one session; holding three corpora's token/emb
    * caches and index relations SIMULTANEOUSLY is pure storage+GC pressure
    * (measured: the r8 full-suite ×10 cells ran 4-8× slower than the same
    * queries in a narrowed session — simhash 11.5s vs 2.9s, ann_cosine
    * 1.27s vs 0.14s — with no code difference). Bench/Verify never need
    * this: they run one dir per process. */
  private[graft] def releaseDirMemos(spark: SparkSession, dir: String): Unit = {
    val key = (spark, dir)
    Option(corpusCache.remove(key)).foreach(_.unpersist(blocking = false))
    Seq(seismicCache, seismicTruncCache).foreach { c =>
      Option(c.remove(key)).foreach { ix =>
        ix.clusters.unpersist(blocking = false)
        ix.summaries.unpersist(blocking = false)
      }
    }
    Option(mllibMinhashCache.remove(key)).foreach { ix =>
      Seq(ix.sigs, ix.shingleHashes, ix.banded).foreach(_.unpersist(blocking = false))
    }
    Option(mllibTfIdfCache.remove(key)).foreach { ix =>
      Seq(ix.features, ix.termTf, ix.dfreq, ix.docNorm)
        .foreach(_.unpersist(blocking = false))
    }
    ivfIndexCache.remove(key) // plain parquet read relation — nothing cached
    postingsIndexCache.remove(key) // same — plain parquet read relation
    ()
  }

  private[graft] val encodeUdf = udf((s: String) => HashEmbedder.encode(s))
  private[graft] def embedUdf(dim: Int) = udf((s: String) => HashEmbedder.embed(s, dim))

  /** Sparse query token maps used by retrieval queries (computed once,
    * deterministic — the "inference hoisting" of the reference,
    * NeuralQueryBuilder.java:905-931, becomes a plan-time literal). */
  private[graft] val qTokensA = HashEmbedder.encode("spark join fast table scan")
  private[graft] val qTokensB = HashEmbedder.encode("stream window agg merge sort batch")
  private[graft] val qDense64 = HashEmbedder.embed("vector search engine query data", 64)

  /** The flagship two-subquery scored relation (A ⊕ B sparse), shared by
    * every q_hybrid_* variant across the query banks — ONE definition so
    * the round-6-before-rank determinism protocol cannot drift per bank. */
  private[graft] def flagshipScored(s: SparkSession, dir: String): DataFrame = {
    val docs = docsWithTokens(s, dir)
    def sub(q: Map[String, Float]): Column = {
      val sc = round(sparse_dot(col("tokens"), typedLit(q)), 6)
      when(sc > 0.0, sc)
    }
    HybridPipeline.score(docs, col("doc_id"), Seq(sub(qTokensA), sub(qTokensB)))
  }

  // -------------------------------------------------- oracle SQL generators
  import OracleGen.{valuesOf, docVectorsCte, sparseScoreSql}

  private def denseLit(v: Array[Float]): String =
    v.map(_.toString).mkString("[", ", ", "]")

  // ----------------------------------------------------------- the flagship

  /** Flagship: hybrid (sparse ⊕ dense-neural) retrieval over the documents
    * corpus, min_max normalization + arithmetic mean combination — the
    * reference's headline query path (SURVEY.md §3.1) on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    import graft.exec.NeuralQuery
    val dir = "/root/testdata/sf0.001"
    val docs = t(spark, dir, "documents")
      .withColumn("tokens", encodeUdf(col("text")))
      .withColumn("emb", embedUdf(HashEmbedder.DefaultDim)(col("text")))
    val qv = HashEmbedder.embed("spark join fast table scan", HashEmbedder.DefaultDim)
    val sparseScore = {
      val sc = round(sparse_dot(col("tokens"), typedLit(qTokensA)), 6)
      when(sc > 0.0, sc)
    }
    val denseScore = {
      val sc = round(dense_cosine(col("emb"), typedLit(qv)), 6)
      when(sc > 0.0, sc)
    }
    val scored = HybridPipeline.score(docs, col("doc_id"), Seq(sparseScore, denseScore))
    HybridPipeline.run(
      scored, 2, NormalizationSpec.MinMax(), CombinationSpec.ArithmeticMean(),
      paginationDepth = Some(100), size = 10)
      .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
  }

  private def hybridMinMax(spark: SparkSession, dir: String): DataFrame = {
    val docs = docsWithTokens(spark, dir)
    // Scores are rounded to 6 decimals BEFORE any ranking so that the DuckDB
    // oracle (which sums the identical float products in a different order)
    // ranks identically — last-ulp double divergence cannot flip a rank.
    def sub(q: Map[String, Float]): Column = {
      val sc = round(sparse_dot(col("tokens"), typedLit(q)), 6)
      when(sc > 0.0, sc) // no overlapping token = no match for this subquery
    }
    val s0 = sub(qTokensA)
    val s1 = sub(qTokensB)
    val scored = HybridPipeline.score(docs, col("doc_id"), Seq(s0, s1))
    HybridPipeline.run(
      scored, 2, NormalizationSpec.MinMax(), CombinationSpec.ArithmeticMean(),
      paginationDepth = Some(100), size = 10)
      .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
  }

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ QueriesExtra.queries ++ Queries3.queries ++ Queries4.queries ++ Queries5.queries ++ Queries6.queries ++ Queries7.queries ++ Queries8.queries ++ Queries9.queries ++ Queries10.queries ++ Queries11.queries ++ Queries12.queries ++ Queries13.queries ++ Queries14.queries ++ Queries15.queries ++ Queries16.queries ++ Queries17.queries ++ Queries18.queries ++ Queries19.queries ++ Queries20.queries

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- relational skeleton (scan/filter/agg/join/window/topk) --------------
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q_topk_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    "q_group_topk" -> ((s, dir) => {
      // per-group top-k via rank window = the collapse/grouping collector
      // pattern (HybridCollapsingTopDocsCollector, SURVEY.md §2.5)
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"), col("rn"))
        .orderBy(col("c_mktsegment"), col("rn"))
    }),

    "q_join_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    "q_filter_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") && col("l_discount") > 0.05)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_extendedprice")), 2).as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    "q_events_hourly" -> ((s, dir) => {
      // Hour bucketing is integer math on the nanos (ts_ns is ~1.7e18,
      // beyond double precision, so `div`, not floating division).
      eventsWithTsNs(s, dir)
        .groupBy(col("event_type"),
          (expr("ts_ns div 3600000000000") * lit(3600000L)).as("hour_ms"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy(col("event_type"), col("hour_ms"))
    }),

    // -- dedup (training-data ops) ------------------------------------------
    "q_dedup_exact" -> ((s, dir) => {
      // exact dedup: hash-groupBy on content (SURVEY: dedup suite)
      t(s, dir, "documents")
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
        .orderBy(col("keep_id"))
    }),

    // -- text analysis ------------------------------------------------------
    "q_text_stats" -> ((s, dir) => {
      val toks = filter(split(col("text"), " "), x => x =!= "")
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_uniq"),
          length(col("text")).as("n_chars_computed"))
        .orderBy(col("doc_id"))
    }),

    // -- dense ANN: brute-force cosine top-k (SURVEY: similarity search) -----
    "q_ann_cosine" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = typedLit(qDense64)
      emb.select(col("vec_id"), round(dense_cosine(col("embedding"), q), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(20)
    }),

    // -- sparse exact top-k (neural_sparse query, exact path) ----------------
    "q_sparse_exact" -> ((s, dir) => {
      val docs = docsWithTokens(s, dir)
      val scored = docs
        .select(col("doc_id"), round(sparse_dot(col("tokens"), typedLit(qTokensA)), 6).as("score"))
        .where(col("score") > 0.0)
      scored
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(10)
    }),

    // -- hybrid retrieval (flagship path) ------------------------------------
    "q_hybrid_minmax_arith" -> ((s, dir) => hybridMinMax(s, dir)),

    "q_hybrid_rrf" -> ((s, dir) => {
      val docs = docsWithTokens(s, dir)
      def sub(q: Map[String, Float]): Column = {
        val sc = round(sparse_dot(col("tokens"), typedLit(q)), 6)
        when(sc > 0.0, sc)
      }
      val scored = HybridPipeline.score(docs, col("doc_id"), Seq(sub(qTokensA), sub(qTokensB)))
      HybridPipeline.run(
        scored, 2, NormalizationSpec.RRF(), CombinationSpec.RRF(),
        paginationDepth = Some(100), size = 10)
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
    })
  )

  // ------------------------------------------------------------- oracle SQL

  def oracleSql: Map[String, String] =
    coreOracleSql ++ QueriesExtra.oracleSql ++ Queries3.oracleSql ++ Queries4.oracleSql ++ Queries5.oracleSql ++ Queries6.oracleSql ++ Queries7.oracleSql ++ Queries8.oracleSql ++ Queries9.oracleSql ++ Queries10.oracleSql ++ Queries11.oracleSql ++ Queries12.oracleSql ++ Queries13.oracleSql ++ Queries14.oracleSql ++ Queries15.oracleSql ++ Queries16.oracleSql ++ Queries17.oracleSql ++ Queries18.oracleSql ++ Queries19.oracleSql ++ Queries20.oracleSql

  private def coreOracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q_group_topk" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |         CAST(row_number() OVER (PARTITION BY c_mktsegment
        |              ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS rn
        |  FROM customer) WHERE rn <= 5
        |ORDER BY c_mktsegment, rn""".stripMargin,

    "q_join_agg" ->
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_filter_agg" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |       round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_discount > 0.05
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_events_hourly" ->
      """SELECT event_type,
        |       epoch_ms(date_trunc('hour', ts)) AS hour_ms,
        |       count(*) AS cnt, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, hour_ms""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
        |       count(*) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,

    "q_text_stats" ->
      """SELECT doc_id,
        |       CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT) AS n_tokens,
        |       CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS INT) AS n_uniq,
        |       CAST(length(text) AS INT) AS n_chars_computed
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_ann_cosine" ->
      s"""SELECT vec_id, round(score, 6) AS score FROM (
         |  SELECT vec_id,
         |         list_cosine_similarity(CAST(embedding AS DOUBLE[]), ${denseLit(qDense64)}) AS score
         |  FROM embeddings)
         |ORDER BY score DESC, vec_id ASC LIMIT 20""".stripMargin,

    "q_sparse_exact" ->
      s"""WITH $docVectorsCte,
         |scores AS (${sparseScoreSql(valuesOf(qTokensA))})
         |SELECT doc_id, score FROM scores
         |WHERE score > 0.0
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,

    "q_hybrid_minmax_arith" -> OracleGen.hybridSql(qTokensA, qTokensB, "min_max", "arithmetic_mean"),
    "q_hybrid_rrf" -> OracleGen.hybridSql(qTokensA, qTokensB, "rrf", "rrf")
  )
}
