package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Plan-SHAPE regression gate. Two past regressions were invisible to the
  * row/schema/hash correctness gate because results stayed right while cost
  * exploded:
  *  - the answer-span UDF's derived `isnotnull(UDF(text))` filter was pushed
  *    below the top-k join onto the full corpus scan, running the
  *    O(window²·len) span kernel over every document for a k-row result;
  *  - the collapse/sort key side of the hybrid pipeline could silently stop
  *    broadcasting, shuffling the combined-result join instead.
  * These tests pin the EXECUTED plan shape, not the output.
  */
class PlansSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** AQE wraps executedPlan in AdaptiveSparkPlanExec (a leaf until run) —
    * disable it for plan introspection so collect() sees the real tree. */
  private def withoutAqe[T](f: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, old)
  }

  private def joinSubtrees(df: DataFrame) =
    df.queryExecution.executedPlan.collect {
      case j if j.nodeName.toLowerCase.contains("join") => j
    }

  test("q_highlight_spans: span UDF evaluates strictly above every join") {
    withoutAqe {
      val df = SparkEntry.queries("q_highlight_spans")(spark, dir)
      val joins = joinSubtrees(df)
      assert(joins.nonEmpty, s"expected a join in:\n${df.queryExecution.executedPlan}")
      // the named span UDF must not appear anywhere BELOW a join (the
      // ingest-time encode/embed UDFs inside the cached corpus relation are
      // fine — they are ingest cost, not per-query cost)
      joins.foreach { j =>
        assert(!j.toString.contains("answer_span("),
          s"span UDF pushed below a join (runs over the corpus, not the top-k):\n$j")
      }
      assert(df.queryExecution.executedPlan.toString.contains("answer_span("),
        "span UDF missing from the plan entirely")
    }
  }

  test("hybrid collapse: key relation joins as a broadcast hash join") {
    withoutAqe {
      val df = SparkEntry.queries("q_hybrid_collapse")(spark, dir)
      val bhj = df.queryExecution.executedPlan.collect {
        case j: BroadcastHashJoinExec => j
      }
      assert(bhj.nonEmpty,
        s"collapse-key join is not broadcast:\n${df.queryExecution.executedPlan}")
    }
  }

  test("decontaminate: bench postings enter the intersection join broadcast") {
    withoutAqe {
      // the train side must stream against broadcast bench postings — a
      // shuffle of the big side here is the 100 TB failure mode
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val df = graft.dedup.Dedup.decontaminate(
        docs.where(org.apache.spark.sql.functions.col("doc_id") % 50 =!= 0),
        docs.where(org.apache.spark.sql.functions.col("doc_id") % 50 === 0))
      // the operator returns a persisted relation (finishReleasing), so the
      // join lives inside the InMemoryRelation's cached plan — assert on
      // the printed tree, which includes it
      val plan = df.queryExecution.executedPlan.toString
      assert("BroadcastHashJoin \\[s#".r.findFirstIn(plan).nonEmpty,
        s"bench postings not broadcast on the shingle-key join:\n$plan")
    }
  }

  test("decontaminateEmbedding: broadcast nested-loop, no shuffle of the train scan") {
    withoutAqe {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val df = graft.dedup.Dedup.decontaminateEmbedding(
        emb.where(org.apache.spark.sql.functions.col("vec_id") % 50 =!= 0),
        emb.where(org.apache.spark.sql.functions.col("vec_id") % 50 === 0),
        threshold = 0.45)
      val plan = df.queryExecution.executedPlan
      assert(plan.toString.contains("BroadcastNestedLoopJoin"),
        s"bench vectors not broadcast:\n$plan")
      val exchanges = plan.collect {
        case e if e.nodeName.contains("Exchange") && !e.nodeName.contains("Broadcast") => e
      }
      assert(exchanges.isEmpty,
        s"train side shuffles before the broadcast join:\n$plan")
    }
  }

  test("winnowPairExtent: the pair relation broadcasts into both text joins") {
    withoutAqe {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      // maxDf set = the pair count is bounded, so the broadcast hint is on
      // (without it the hint is withheld and AQE sizes the join at runtime
      // — a corpus-hot fingerprint would otherwise force a quadratic pair
      // relation through a mandatory broadcast)
      val df = graft.dedup.Dedup.winnowPairExtent(docs, minShared = 1,
        maxDf = Some(1000))
      val plan = df.queryExecution.executedPlan
      val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
      assert(bhj.size >= 2,
        s"expected two broadcast joins (pairs x text_a, x text_b):\n$plan")
      // the corpus scan must not shuffle for the join
      val shuffles = plan.collect {
        case e if e.nodeName.contains("Exchange") && !e.nodeName.contains("Broadcast") => e
      }
      assert(shuffles.isEmpty, s"corpus side shuffles before the pair joins:\n$plan")
    }
  }

  test("scoreBatchSparse: the query-batch side broadcasts into the postings join") {
    withoutAqe {
      val docs = SparkEntry.docsWithTokens(spark, dir)
      val postings = graft.sparse.SparseRetrieval.buildPostings(docs)
      val scored = graft.exec.HybridPipeline.scoreBatchSparse(postings,
        Map(0L -> Seq(SparkEntry.qTokensA, SparkEntry.qTokensB)))
      val bhj = scored.queryExecution.executedPlan.collect {
        case j: BroadcastHashJoinExec => j
      }
      assert(bhj.nonEmpty,
        s"query batch is not broadcast:\n${scored.queryExecution.executedPlan}")
    }
  }

  test("flagStreamEmbedding bench side: LSH buckets + vectors join broadcast (batch form)") {
    withoutAqe {
      // same plan shape the stream-static join compiles to: run the batch
      // relation (stream plans aren't introspectable pre-execution)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val plan = graft.streaming.StreamingDecontaminate
        .flagStreamEmbedding(emb.where(org.apache.spark.sql.functions.col("vec_id") % 50 =!= 0),
          emb.where(org.apache.spark.sql.functions.col("vec_id") % 50 === 0), dim = 64,
          threshold = 0.45, nbits = 4, tables = 8)
        .queryExecution.executedPlan
      val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
      assert(bhj.nonEmpty, s"bench buckets are not broadcast:\n$plan")
    }
  }

  test("q_sparse_batch_pruned: bucket probe reaches the scan as a partition filter") {
    withoutAqe {
      val df = SparkEntry.queries("q_sparse_batch_pruned")(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
        s"bucket probe is not partition pruning:\n$plan")
      assert(!plan.contains("PartitionFilters: []"),
        s"partition filter list is empty:\n$plan")
    }
  }

  test("decontaminateWinnow: bench fingerprints enter the join broadcast") {
    withoutAqe {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val df = graft.dedup.Dedup.decontaminateWinnow(
        docs.where(org.apache.spark.sql.functions.col("doc_id") % 50 =!= 0),
        docs.where(org.apache.spark.sql.functions.col("doc_id") % 50 === 0))
      val plan = df.queryExecution.executedPlan.toString
      assert("BroadcastHashJoin \\[gh#".r.findFirstIn(plan).nonEmpty,
        s"bench winnow fingerprints not broadcast on the hash-key join:\n$plan")
    }
  }

  test("minhash deltaPairs: index relations join broadcast, never sort-merge") {
    withoutAqe {
      import org.apache.spark.sql.functions.col
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val d = java.nio.file.Files.createTempDirectory("mhidx_plan").toFile
      d.deleteOnExit()
      graft.dedup.MinhashIndex.write(
        docs.where(col("doc_id") % 10 =!= 7), d.getAbsolutePath)
      val out = graft.dedup.MinhashIndex.deltaPairs(
        spark, d.getAbsolutePath, docs.where(col("doc_id") % 10 === 7),
        threshold = 0.5)
      // finishReleasing persisted the result; the printed tree includes the
      // cached child plan. The scale contract: every join touching an
      // index-sized scan (postings candidate join, sketches verification
      // joins) is a broadcast hash join — the only sort-merge-eligible
      // shuffles are delta-bounded aggregations, so NO SortMergeJoin may
      // appear anywhere in the pipeline.
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        s"index-sized relation entered a sort-merge join:\n$plan")
      assert(plan.contains("BroadcastHashJoin"),
        s"expected broadcast joins on the index scans:\n$plan")
      // r13: the index scans PRUNE — the delta's touched buckets and the
      // candidate ids' buckets reach the postings/sketches Parquet scans
      // as partition filters (the writePostingsIndex protocol applied to
      // the dedup index; a micro-batch must not pay O(index) reads)
      assert("PartitionFilters: \\[pb#\\d+".r.findFirstIn(plan).nonEmpty,
        s"postings scan is not partition-pruned:\n$plan")
      assert("PartitionFilters: \\[sb#\\d+".r.findFirstIn(plan).nonEmpty,
        s"sketches scan is not partition-pruned:\n$plan")
    }
  }

  test("winnow deltaPairs: index postings scan is partition-pruned") {
    withoutAqe {
      import org.apache.spark.sql.functions.col
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val d = java.nio.file.Files.createTempDirectory("wnidx_plan").toFile
      d.deleteOnExit()
      graft.dedup.WinnowIndex.write(
        docs.where(col("doc_id") % 10 =!= 7), d.getAbsolutePath, k = 4, w = 4)
      val out = graft.dedup.WinnowIndex.deltaPairs(
        spark, d.getAbsolutePath, docs.where(col("doc_id") % 10 === 7),
        minShared = 2)
      val plan = out.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[pb#\\d+".r.findFirstIn(plan).nonEmpty,
        s"winnow postings scan is not partition-pruned:\n$plan")
    }
  }

  test("embedding deltaPairs: postings AND sketches scans are partition-pruned") {
    withoutAqe {
      import org.apache.spark.sql.functions.col
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val d = java.nio.file.Files.createTempDirectory("emidx_plan").toFile
      d.deleteOnExit()
      graft.dedup.EmbeddingIndex.write(
        emb.where(col("vec_id") % 10 =!= 7), d.getAbsolutePath,
        dim = 64, nbits = 4, tables = 8)
      val out = graft.dedup.EmbeddingIndex.deltaPairs(
        spark, d.getAbsolutePath, emb.where(col("vec_id") % 10 === 7),
        threshold = 0.45)
      val plan = out.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[pb#\\d+".r.findFirstIn(plan).nonEmpty,
        s"embedding postings scan is not partition-pruned:\n$plan")
      assert("PartitionFilters: \\[sb#\\d+".r.findFirstIn(plan).nonEmpty,
        s"embedding sketches scan is not partition-pruned:\n$plan")
    }
  }
}
