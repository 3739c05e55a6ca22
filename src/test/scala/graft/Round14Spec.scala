package graft

import org.apache.spark.sql.functions._

import graft.dedup.{ClusterFold, Dedup, IndexCompaction, MinhashIndex, WinnowIndex}

/** Round-14 pins: file-count compaction for the written dedup indexes
  * (VERDICT r13 task #4) and the partitioned cluster snapshot's forced
  * compaction / grid re-derivation (task #1's amortized path). */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  private def tmpPath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"r14_$tag").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  private def docs(range: Range) = range.map { i =>
    val cluster = i / 3
    (i.toLong, s"the quick brown fox number $cluster jumps over the lazy dog " +
      s"and then walks around the block ${if (i % 3 == 2) "slowly today" else "quickly"}")
  }.toDF("doc_id", "text")

  private def dataFiles(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(dir))
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("MinhashIndex.compact merges append debris; deltaPairs unchanged") {
    val path = tmpPath("mh_compact")
    MinhashIndex.write(docs(0 until 12), path)
    // many small appends: one file lands per touched partition per append
    (1 to 6).foreach { i =>
      MinhashIndex.append(docs(12 + 3 * i until 15 + 3 * i), path)
    }
    val probe = docs(200 until 206)
      .withColumn("text", concat(col("text"), lit(" fox number 1 jumps")))
    val before = pairSet(MinhashIndex.deltaPairs(spark, path,
      docs(0 until 3).unionByName(probe), threshold = 0.5))
    assert(before.nonEmpty)
    val filesBefore = dataFiles(s"$path/postings")
    val done = MinhashIndex.compact(spark, path, maxFiles = 2)
    assert(done > 0, "nothing compacted — the appends did not fragment?")
    val filesAfter = dataFiles(s"$path/postings")
    assert(filesAfter < filesBefore,
      s"compaction did not reduce files: $filesBefore -> $filesAfter")
    val after = pairSet(MinhashIndex.deltaPairs(spark, path,
      docs(0 until 3).unionByName(probe), threshold = 0.5))
    assert(after == before, "compaction changed deltaPairs output")
    // idempotent: a second run finds nothing over-threshold at maxFiles=64
    assert(MinhashIndex.compact(spark, path, maxFiles = 64) == 0)
  }

  test("WinnowIndex.compact preserves deltaPairs under minShared") {
    val path = tmpPath("wn_compact")
    WinnowIndex.write(docs(0 until 9), path, k = 4, w = 4)
    (1 to 5).foreach { i =>
      WinnowIndex.append(docs(9 + 3 * i until 12 + 3 * i), path)
    }
    val delta = docs(0 until 6).withColumn("doc_id", col("doc_id") + 500)
    val before = pairSet(WinnowIndex.deltaPairs(spark, path, delta, minShared = 2))
    assert(WinnowIndex.compact(spark, path, maxFiles = 2) > 0)
    val after = pairSet(WinnowIndex.deltaPairs(spark, path, delta, minShared = 2))
    assert(after == before && after.nonEmpty)
  }

  test("IndexCompaction repairs crash debris before compacting") {
    val path = tmpPath("mh_crash")
    MinhashIndex.write(docs(0 until 12), path)
    (1 to 3).foreach { i =>
      MinhashIndex.append(docs(12 + 3 * i until 15 + 3 * i), path)
    }
    val postings = new java.io.File(s"$path/postings")
    val leaves = postings.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("pb="))
    assert(leaves.nonEmpty)
    // simulate a crash between the two swap renames: live leaf gone,
    // retired copy present
    val victim = leaves.head
    val retired = new java.io.File(postings, s".retired_${victim.getName}")
    assert(victim.renameTo(retired))
    // and stale pre-swap debris for another leaf
    val junk = new java.io.File(postings, s".compact_pb=99999")
    assert(junk.mkdir())
    IndexCompaction.compactDir(spark, s"$path/postings", maxFiles = 1000)
    assert(new java.io.File(postings, victim.getName).exists(),
      "retired leaf was not restored")
    assert(!retired.exists() && !junk.exists(), "debris survived")
  }

  test("ingestStream with compactEvery: same pairs, bounded file count") {
    // 15 micro-batches: each append lands ~1 file per touched pb leaf, so
    // leaves cross compact()'s maxFiles=8 default mid-stream
    val all = docs(0 until 30).persist()
    val srcDir = tmpPath("cmp_src")
    all.repartition(15).write.mode("overwrite").parquet(srcDir)
    def run(compactEvery: Int, tag: String) = {
      val root = tmpPath(s"cmp_$tag")
      val idx = s"$root/index"; val out = s"$root/pairs"
      MinhashIndex.write(all.limit(0), idx)
      val stream = spark.readStream.schema(all.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      MinhashIndex.ingestStream(stream, idx, out, threshold = 0.5,
        compactEvery = compactEvery)
      (pairSet(spark.read.parquet(out).dropDuplicates("id_a", "id_b")),
        dataFiles(s"$idx/postings"))
    }
    val (plainPairs, plainFiles) = run(0, "plain")
    val (compPairs, compFiles) = run(2, "every2")
    assert(compPairs == plainPairs && compPairs.nonEmpty,
      "in-loop compaction changed the emitted pair stream")
    assert(compFiles < plainFiles,
      s"compaction did not bound files: $plainFiles -> $compFiles")
    all.unpersist()
  }

  test("ingestStreamClustered with compactEvery: assignment == whole-corpus closure") {
    import graft.dedup.{ClusterFold, WinnowIndex}
    val all = docs(0 until 30).persist()
    val srcDir = tmpPath("cmpcl_src")
    all.repartition(10).write.mode("overwrite").parquet(srcDir)
    val root = tmpPath("cmpcl")
    val idx = s"$root/index"; val cl = s"$root/clusters"
    WinnowIndex.write(all.limit(0), idx, k = 4, w = 4)
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    WinnowIndex.ingestStreamClustered(stream, idx, cl, minShared = 2,
      compactEvery = 3)
    val got = ClusterFold.currentClustersFull(spark, cl,
      all.select(col("doc_id").as("id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Dedup.resolveClusters(
      Dedup.winnowPairs(all, k = 4, w = 4, minShared = 2)
        .select(col("id_a"), col("id_b")),
      all.select(col("doc_id").as("id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.groupBy(_._2).exists(_._2.size > 1))
    all.unpersist()
  }

  test("ClusterFold forced compaction re-derives the grid, correctness intact") {
    val cl = tmpPath("fold_compact")
    val ids = (0L to 40L).toDF("id")
    val p0 = (0 until 10).map(i => (i * 4L, i * 4L + 1)).toDF("id_a", "id_b")
    ClusterFold.foldBatch(spark, cl, 0L, p0, ids)
    // targetRows = 0 forces the compaction branch: everything rewritten
    // into the new epoch dir, every manifest entry re-referenced
    ClusterFold.foldBatch(spark, cl, 1L, Seq((0L, 2L)).toDF("id_a", "id_b"),
      ids, targetRows = 0L)
    val m = ClusterFold.readManifest(cl).get
    assert(m.entries.values.toSet == Set("e1"),
      s"compaction left stale references: ${m.entries.values.toSet}")
    assert(m.rows == 21L) // 10 pairs + {0,1,2} merged = 20 - 2 + 3
    val got = ClusterFold.currentClustersFull(spark, cl, ids)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Dedup.resolveClusters(
      p0.unionByName(Seq((0L, 2L)).toDF("id_a", "id_b")), ids)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }
}
