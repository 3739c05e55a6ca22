package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Evidence for the SCALE.md co-partitioned-join claim: corpus tables
  * bucketed by doc_id at ingest join WITHOUT a shuffle exchange — the plan
  * shape that makes skip_existing re-ingest and enrichment joins zero-
  * shuffle at 100 TB. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join with no shuffle Exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a sort-merge join so bucketing (not a broadcast) removes the
    // exchanges; AQE off so the final plan is inspectable deterministically
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = (1L to 1000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
      val embs = (1L to 1000L).map(i => (i, Array.fill(4)(i.toFloat))).toDF("doc_id", "emb")
      docs.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
        .saveAsTable("g_docs_bucketed")
      embs.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
        .saveAsTable("g_embs_bucketed")
      val joined = spark.table("g_docs_bucketed")
        .join(spark.table("g_embs_bucketed"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      assert(joined.count() == 1000)
      // contrast: the same join on UNBUCKETED data shuffles both sides
      val unbucketed = docs.join(embs, "doc_id")
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS g_docs_bucketed")
      spark.sql("DROP TABLE IF EXISTS g_embs_bucketed")
    }
  }
}
