package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, EmbeddingIndex, IndexMeta, MinhashIndex, WinnowIndex}

/** Round-14 pins, part 1 (ADVICE r13 — restored after an accidental overwrite by part 2): legacy (nPart = 0, pre-partitioned
  * layout) indexes must stay readable AND appendable — the partitioned
  * writers would otherwise compute pmod(key, 0) (an ANSI-mode error), and
  * the embedding capped path would fail on the missing bid column. */
class Round14LegacySpec extends SparkSpec {
  import spark.implicits._

  private def tmpPath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"r14_$tag").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  /** Rewrite a freshly-written partitioned index as the legacy layout:
    * unpartitioned relation dirs + a meta whose nPart field is 0. */
  private def legacyOf(src: String, dst: String, metaName: String,
      rels: Seq[String], dropCols: Seq[String] = Nil): Unit = {
    rels.foreach { rel =>
      val raw = spark.read.parquet(s"$src/$rel")
      val cols = raw.columns.filterNot(c =>
        c == "pb" || c == "sb" || dropCols.contains(c))
      raw.select(cols.map(col): _*)
        .coalesce(1).write.mode("overwrite").parquet(s"$dst/$rel")
    }
    val fields = IndexMeta.read(src, metaName).toSeq
    IndexMeta.write(dst, metaName, fields.init :+ "0") // nPart is last
  }

  private def docs(n: Int) = (0 until n).map { i =>
    (i.toLong, s"the quick brown fox number ${i / 2} jumps over the lazy " +
      s"dog and walks ${if (i % 2 == 1) "slowly" else "quickly"} home")
  }.toDF("doc_id", "text")

  test("MinhashIndex legacy layout: append + deltaPairs still work (no pmod-by-0)") {
    val part = tmpPath("mh_part"); val leg = tmpPath("mh_leg")
    MinhashIndex.write(docs(6), part)
    legacyOf(part, leg, "MINHASH_META", Seq("postings", "sketches"))
    val delta = Seq((100L, "the quick brown fox number 0 jumps over the lazy " +
      "dog and walks quickly home")).toDF("doc_id", "text")
    val before = MinhashIndex.deltaPairs(spark, leg, delta, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before.nonEmpty)
    // the ADVICE failure: any append on a legacy index computed pmod(_, 0)
    MinhashIndex.append(delta, leg)
    val delta2 = Seq((200L, "the quick brown fox number 0 jumps over the " +
      "lazy dog and walks quickly home")).toDF("doc_id", "text")
    val after = MinhashIndex.deltaPairs(spark, leg, delta2, threshold = 0.5)
    // the appended doc 100 is now indexed and pairs with 200
    assert(after.where(col("id_a") === 100L && col("id_b") === 200L).count() == 1)
  }

  test("WinnowIndex legacy layout: append + deltaPairs still work") {
    val part = tmpPath("wn_part"); val leg = tmpPath("wn_leg")
    WinnowIndex.write(docs(6), part, k = 4, w = 4)
    legacyOf(part, leg, "WINNOW_META", Seq("postings"))
    val delta = docs(6).where(col("doc_id") === 0L)
      .withColumn("doc_id", lit(100L))
    WinnowIndex.append(delta, leg)
    val delta2 = docs(6).where(col("doc_id") === 0L)
      .withColumn("doc_id", lit(200L))
    val after = WinnowIndex.deltaPairs(spark, leg, delta2, minShared = 2)
    assert(after.where(col("id_a") === 100L && col("id_b") === 200L).count() == 1)
  }

  test("EmbeddingIndex legacy layout without bid: capped deltaPairs reads and appends") {
    def sameVec(ids: Seq[Long]) =
      ids.map(i => (i, Seq.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val part = tmpPath("em_part"); val leg = tmpPath("em_leg")
    EmbeddingIndex.write(sameVec(Seq(0L, 1L, 2L)), part,
      dim = 8, nbits = 4, tables = 2)
    // legacy layout: pre-r13 postings had no bid column at all
    legacyOf(part, leg, "EMB_META", Seq("postings", "sketches"),
      dropCols = Seq("bid"))
    // capped path must not throw on the missing column (ADVICE r13); with
    // a synthesized bid the single base batch counts once → pop 3 + 1
    val capped = EmbeddingIndex.deltaPairs(spark, leg, sameVec(Seq(100L)),
      threshold = 0.9, maxBucket = Some(3))
    assert(capped.isEmpty) // pop 4 > 3 → hot everywhere → no pairs
    val loose = EmbeddingIndex.deltaPairs(spark, leg, sameVec(Seq(100L)),
      threshold = 0.9, maxBucket = Some(4))
    assert(loose.count() == 3L) // 100 × {0,1,2}
    // append on the legacy layout must not compute pmod(_, 0) either
    EmbeddingIndex.append(sameVec(Seq(100L)), leg)
    val after = EmbeddingIndex.deltaPairs(spark, leg, sameVec(Seq(200L)),
      threshold = 0.9)
    assert(after.count() == 4L) // 200 × {0,1,2,100}
  }
}
