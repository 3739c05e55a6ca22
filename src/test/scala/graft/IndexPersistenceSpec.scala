package graft

import org.apache.spark.sql.functions._

import graft.ann.Ann
import graft.ingest.Enrich
import graft.ml.HashEmbedder
import graft.seismic.Seismic

/** Index persistence: SEISMIC and IVF derived tables written to Parquet and
  * read back must search identically to the in-memory build — the durable
  * analogue of the reference's codec write/read cycle
  * (SparsePostingsConsumer → SparseTermsLuceneReader). */
class IndexPersistenceSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  private lazy val docs = (1L to 120L).map { i =>
    (i, s"doc $i about ${Seq("spark", "join", "scan", "sort", "agg")(i.toInt % 5)} " +
      s"topic ${"word " * (i % 9).toInt}")
  }.toDF("doc_id", "text").withColumn("tokens", Enrich.encodeUdf(col("text")))

  test("SEISMIC: write → load → search equals the in-memory index") {
    val idx = Seismic.build(docs, nPostings = 16)
    val q = HashEmbedder.encode("spark join topic word")
    val inMem = Seismic.search(idx, docs, q, k = 10, topN = 4, heapFactor = 2.0f)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val path = tmpDir("seismic_idx")
    Seismic.write(idx, path)
    val loaded = Seismic.load(spark, path)
    val searched = Seismic.search(loaded, docs, q, k = 10, topN = 4,
      heapFactor = 2.0f)
    // r13: the query cut's token-hash buckets must reach the written
    // clusters/summaries scans as PARTITION filters (directory pruning) —
    // a search over a loaded index reads only the cut's buckets
    val plan = searched.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[tb#\\d+".r.findFirstIn(plan).nonEmpty,
      s"seismic scans are not partition-pruned:\n$plan")
    val fromDisk = searched
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromDisk == inMem)
    assert(inMem.nonEmpty)
  }

  test("SEISMIC batch search over a loaded index equals the per-query loop") {
    val idx = Seismic.build(docs, nPostings = 16)
    val path = tmpDir("seismic_idx_batch")
    Seismic.write(idx, path)
    val loaded = Seismic.load(spark, path)
    val qs = Map(
      1L -> HashEmbedder.encode("spark join topic word"),
      2L -> HashEmbedder.encode("scan sort agg doc"))
    val batch = Seismic.searchBatch(loaded, docs, qs, k = 5, topN = 4,
      heapFactor = 2.0f)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val loop = qs.toSeq.flatMap { case (qid, q) =>
      Seismic.search(loaded, docs, q, k = 5, topN = 4, heapFactor = 2.0f)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1))).toSeq
    }.toSet
    assert(batch == loop && batch.nonEmpty)
  }

  test("IVF: write → load → probe equals the in-memory index, via partition pruning") {
    val embs = (1L to 200L).map(i => (i, HashEmbedder.embed(s"vector item $i cluster ${i % 7}", 16)))
      .toDF("vec_id", "embedding")
    val centroids = Ann.trainCentroids(embs, dim = 16, nlist = 4, iters = 1)
    val assigned = Ann.assign(embs, centroids, roundDp = 6)
    val q = HashEmbedder.embed("vector item cluster", 16)
    val inMem = Ann.ivfTopK(assigned, centroids, q, k = 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSeq

    val path = tmpDir("ivf_idx")
    Ann.writeIndex(assigned, centroids, path)
    val (loadedAssign, loadedCents) = Ann.loadIndex(spark, path)
    assert(loadedCents.zip(centroids).forall { case (a, b) => a.sameElements(b) })
    val probed = Ann.ivfTopK(loadedAssign, loadedCents, q, k = 10, nprobe = 2)
    // the centroid_id isin filter must reach the scan as a PARTITION filter
    // (directory pruning), not a post-scan predicate
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"))
    assert(probed.collect().map(_.getLong(0)).toSeq == inMem)
  }
}
