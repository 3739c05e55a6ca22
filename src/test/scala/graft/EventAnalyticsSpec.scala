package graft

import graft.events.EventAnalytics

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val W = 604800000000000L // one week in ns

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "ts_ns")

  test("funnel requires each step strictly after the previous anchor") {
    val df = ev(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L), // full path
      (2L, "click", 50L), (2L, "view", 100L),                          // click BEFORE view
      (3L, "view", 100L), (3L, "click", 100L),                         // tie: not strictly after
      (4L, "view", 100L), (4L, "click", 150L),                         // no purchase
      (5L, "purchase", 10L))                                           // purchase only
    val out = EventAnalytics.funnel(df, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toList
      .sortBy(_._1)
    assert(out == List((0, "view", 4L), (1, "click", 2L), (2, "purchase", 1L)),
      s"got $out")
  }

  test("funnel uses the FIRST anchor, not any qualifying event") {
    // user views at t=100 and t=500; clicks at t=200. The click qualifies
    // against the FIRST view even though it precedes the second.
    val df = ev((1L, "view", 100L), (1L, "view", 500L), (1L, "click", 200L))
    val out = EventAnalytics.funnel(df, Seq("view", "click"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(out == Map("view" -> 1L, "click" -> 1L))
  }

  test("retention cohorts count distinct users per week offset") {
    val df = ev(
      (1L, "view", 0L), (1L, "view", W + 1), (1L, "view", 2 * W + 1), // weeks 0,1,2
      (2L, "view", 1L), (2L, "view", 2 * W + 5),                      // weeks 0,2
      (3L, "view", W + 2),                                            // cohort week 1
      (1L, "click", 5L))                                              // same (u, week): no double count
    val out = EventAnalytics.retentionCohorts(df)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 2L,
      (1L, 0L) -> 1L), s"got $out")
  }
}
