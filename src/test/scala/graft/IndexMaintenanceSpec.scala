package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.seismic.Seismic
import graft.sparse.SparseRetrieval
import graft.streaming.IndexMaintenance

class IndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(ids: Range): DataFrame =
    ids.map { i =>
      val toks = Map(
        s"t${i % 7}" -> (1.0f + (i % 5) * 0.3f),
        s"t${(i + 3) % 7}" -> (0.5f + (i % 3) * 0.2f),
        "common" -> 0.8f)
      (i.toLong, toks)
    }.toDF("doc_id", "tokens")

  private val q = Map("t1" -> 1.0f, "t4" -> 0.7f, "common" -> 0.3f)

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_im_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("segmented search with no pruning equals exact top-k over base ∪ delta") {
    val root = freshRoot("nopr")
    val base = corpus(0 until 40)
    val delta = corpus(40 until 50)
    IndexMaintenance.initialize(base, root)
    IndexMaintenance.appendBatch(delta, root)
    val v = IndexMaintenance.currentVersion(root)
    val idx = Seismic.load(spark, IndexMaintenance.indexDir(root, v))
    val baseC = spark.read.parquet(IndexMaintenance.baseDir(root, v))
    val deltaC = IndexMaintenance.readDelta(spark, root, baseC)
    val got = IndexMaintenance.searchSegmented(idx, baseC, deltaC, q,
        k = 8, topN = q.size, heapFactor = Float.PositiveInfinity)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    val want = SparseRetrieval.exactTopK(base.unionByName(delta), q, 8)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    assert(got == want)
    // fresh delta docs are never less visible: a delta doc in the exact
    // top-k appears even under aggressive base pruning
    val pruned = IndexMaintenance.searchSegmented(idx, baseC, deltaC, q,
        k = 8, topN = 2, heapFactor = 1.0f)
      .select("doc_id").as[Long].collect().toSet
    val deltaTop = want.filter(_._1 >= 40).map(_._1).toSet
    assert(deltaTop.nonEmpty, "fixture must place delta docs in the top-k")
    assert(deltaTop.subsetOf(pruned))
  }

  test("compaction republishes: post-compact search equals a from-scratch build") {
    val root = freshRoot("compact")
    val base = corpus(0 until 40)
    val delta = corpus(40 until 50)
    IndexMaintenance.initialize(base, root)
    IndexMaintenance.appendBatch(delta, root)
    val v1 = IndexMaintenance.compact(spark, root)
    assert(v1 == 1L && IndexMaintenance.currentVersion(root) == 1L)
    // delta cleared after compaction
    val newBase = spark.read.parquet(IndexMaintenance.baseDir(root, v1))
    assert(IndexMaintenance.readDelta(spark, root, newBase).count() == 0)
    assert(newBase.count() == 50)
    // the compacted index answers EXACTLY like an index built from scratch
    // over the same rows (deterministic seeded build)
    val compacted = Seismic.load(spark, IndexMaintenance.indexDir(root, v1))
    val scratch = Seismic.build(newBase)
    val a = Seismic.search(compacted, newBase, q, k = 8, topN = 2, heapFactor = 1.5f)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    val b = Seismic.search(scratch, newBase, q, k = 8, topN = 2, heapFactor = 1.5f)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    assert(a == b)
    // old version untouched (readers at v0 keep working)
    assert(spark.read.parquet(IndexMaintenance.baseDir(root, 0)).count() == 40)
  }

  test("replayed batch ids overwrite; retired dirs stay invisible after a 'crash'") {
    val root = freshRoot("crashsafe")
    IndexMaintenance.initialize(corpus(0 until 40), root)
    // at-least-once replay: the same batchId lands twice, rows counted once
    IndexMaintenance.appendBatch(corpus(40 until 50), root, batchId = 0)
    IndexMaintenance.appendBatch(corpus(40 until 50), root, batchId = 0)
    val base0 = spark.read.parquet(IndexMaintenance.baseDir(root, 0))
    assert(IndexMaintenance.readDelta(spark, root, base0).count() == 10)
    val v1 = IndexMaintenance.compact(spark, root)
    val newBase = spark.read.parquet(IndexMaintenance.baseDir(root, v1))
    assert(newBase.count() == 50)
    // simulate a crash BETWEEN publish and physical cleanup: resurrect a
    // batch dir at an id ≤ the watermark holding rows already in the base —
    // the watermark must keep it invisible (no double-serving)
    IndexMaintenance.appendBatch(corpus(40 until 50), root, batchId = 0)
    assert(IndexMaintenance.readDelta(spark, root, newBase).count() == 0)
    // a FRESH ad-hoc append self-assigns an id above the watermark
    IndexMaintenance.appendBatch(corpus(50 until 55), root)
    assert(IndexMaintenance.readDelta(spark, root, newBase).count() == 5)
    // and the next compaction folds only the live rows (no duplicates)
    val v2 = IndexMaintenance.compact(spark, root)
    assert(spark.read.parquet(IndexMaintenance.baseDir(root, v2)).count() == 55)
  }

  test("segmented IVF: full-probe search equals brute over base ∪ delta; compaction republishes") {
    import graft.ann.Ann
    val root = freshRoot("ivf")
    val rnd = new scala.util.Random(9)
    def vecs(ids: Range) = ids.map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val all = vecs(0 until 60).persist()
    val base = all.where($"vec_id" < 48)
    val delta = all.where($"vec_id" >= 48)
    val centroids = Ann.seededCentroids(nlist = 4, dim = 8)
    IndexMaintenance.initializeIvf(base, root, centroids)
    IndexMaintenance.appendBatch(delta, root)
    val v = IndexMaintenance.currentVersion(root)
    val (assigned, cents) = Ann.loadIndex(spark, IndexMaintenance.ivfDir(root, v))
    val baseC = spark.read.parquet(IndexMaintenance.baseDir(root, v))
    val deltaC = IndexMaintenance.readDelta(spark, root, baseC)
    val q = Array.fill(8)(rnd.nextGaussian().toFloat)
    // nprobe = nlist → base side exact → segmented ≡ brute over the union
    val got = IndexMaintenance.searchSegmentedIvf(assigned, cents, deltaC, q,
        k = 7, nprobe = 4)
      .select("vec_id", "score").as[(Long, Double)].collect().toSeq
    val want = Ann.bruteForceTopK(all, q, 7)
      .select("vec_id", "score").as[(Long, Double)].collect().toSeq
    assert(got == want)
    // compaction: all rows move to the new base, delta clears, and the
    // republished index answers like a fresh assignment over the union
    val v1 = IndexMaintenance.compactIvf(spark, root, centroids)
    assert(v1 == 1L)
    val (a1, c1) = Ann.loadIndex(spark, IndexMaintenance.ivfDir(root, v1))
    val newBase = spark.read.parquet(IndexMaintenance.baseDir(root, v1))
    assert(newBase.count() == 60)
    assert(IndexMaintenance.readDelta(spark, root, newBase).count() == 0)
    val compacted = Ann.ivfTopK(a1, c1, q, 7, nprobe = 4)
      .select("vec_id", "score").as[(Long, Double)].collect().toSeq
    val fresh = Ann.ivfTopK(Ann.assign(newBase, centroids, roundDp = 6), centroids,
        q, 7, nprobe = 4)
      .select("vec_id", "score").as[(Long, Double)].collect().toSeq
    assert(compacted == fresh)
  }

  test("maintain() appends per micro-batch and compacts when the policy fires") {
    val root = freshRoot("stream")
    IndexMaintenance.initialize(corpus(0 until 40), root)
    // stage two single-file batches in a landing dir; maxFilesPerTrigger=1
    // makes each file one micro-batch (the flush-per-segment analogue)
    val land = freshRoot("land")
    corpus(40 until 45).coalesce(1).write.mode("append").parquet(land)
    corpus(45 until 50).coalesce(1).write.mode("append").parquet(land)
    val stream = spark.readStream
      .schema(corpus(0 until 1).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(land)
    // ratio 0.2: 40 base docs → compaction fires once delta ≥ 8 (the second
    // batch pushes it from 5 to 10)
    val sq = IndexMaintenance.maintain(stream, root, maxDeltaRatio = 0.2)
    sq.awaitTermination()
    assert(IndexMaintenance.currentVersion(root) >= 1L)
    val v = IndexMaintenance.currentVersion(root)
    val baseC = spark.read.parquet(IndexMaintenance.baseDir(root, v))
    val deltaC = IndexMaintenance.readDelta(spark, root, baseC)
    // every ingested row is in exactly one place
    assert(baseC.count() + deltaC.count() == 50)
    // and the segmented view serves ALL rows: no-pruning search ≡ exact
    val idx = Seismic.load(spark, IndexMaintenance.indexDir(root, v))
    val got = IndexMaintenance.searchSegmented(idx, baseC, deltaC, q,
        k = 8, topN = q.size, heapFactor = Float.PositiveInfinity)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    val want = SparseRetrieval.exactTopK(corpus(0 until 50), q, 8)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    assert(got == want)
  }
}
