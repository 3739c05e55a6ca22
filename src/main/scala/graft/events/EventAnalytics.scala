package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-analytics operators over the normalized events relation
  * (`ts_ns: Long` — always load through `SparkEntry.eventsWithTsNs`):
  * ordered-step funnels and weekly cohort retention. Both are pure
  * integer/relational pipelines — week bucketing is `div` on the nanos
  * (ts_ns ~1.7e18 exceeds double's exact range, so never floating
  * division), counts are exact — which makes the oracles trivial and the
  * results engine-independent. */
object EventAnalytics {

  /** Ordered-step funnel: how many users complete step 1, then step 2
    * STRICTLY AFTER their first step-1 event, and so on (each step's
    * anchor is the EARLIEST qualifying event after the previous anchor —
    * the standard first-touch funnel). Returns one row per step:
    * (step_idx, step, n_users).
    *
    * Scale shape: one filtered aggregation per step, each shuffling on
    * user_id only the users still in the funnel — the relation shrinks
    * monotonically, and no per-user event lists are ever materialized
    * (the window-function formulation would sort every user's full
    * history; this one only carries one anchor timestamp per survivor).
    * Each step's frontier is persisted and materialized before the next
    * step builds on it, and its count is taken from that SAME
    * materialization — an N-step funnel therefore scans the events
    * relation exactly once per step. (The earlier lazy form re-executed
    * step i's whole join chain once per downstream aggregate — O(N²)
    * event scans, harmless at 3 steps, ~55 re-scans at 10.) Frontier
    * caches are per-call scratch, released before returning; the result
    * is a steps-sized local relation.
    *
    * EAGER CONTRACT: unlike the other operators here, calling funnel()
    * EXECUTES N Spark jobs (one persist+count per step) and returns a
    * driver-local steps-sized DataFrame — it is not a lazy, composable
    * plan, and it cannot be applied to a streaming DataFrame
    * (persist/count are batch-only; streaming funnels go through
    * [[graft.streaming]]'s stateful paths). */
  /** `maxGapNs`: optional CONVERSION WINDOW — step i+1 must land within
    * maxGapNs of step i's anchor (strictly-after still applies). A user
    * whose only qualifying event is outside the window drops out of the
    * funnel at that step; the anchor stays the earliest in-window event.
    * Pure extra predicate on the per-step join — same one-scan-per-step
    * shape. */
  def funnel(events: DataFrame, steps: Seq[String],
      typeCol: String = "event_type", userCol: String = "user_id",
      tsCol: String = "ts_ns", maxGapNs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val base = events.select(col(userCol).cast("long").as("u"),
      col(typeCol).as("et"), col(tsCol).as("t"))
    val frontiers = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // persist + count: the count IS the step's n_users (one action per
    // step, no second aggregation pass), and the warm cache is what the
    // next step's join reads instead of re-running this step's lineage
    def materialize(df: DataFrame): (DataFrame, Long) = {
      val p = df.persist()
      val n = p.count()
      frontiers += p
      (p, n)
    }
    var (cur, n0) = materialize(base.where(col("et") === steps.head)
      .groupBy(col("u")).agg(min(col("t")).as("tprev")))
    val counts = scala.collection.mutable.ArrayBuffer((0, steps.head, n0))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val inWindow = maxGapNs match {
        case Some(g) => col("t") > col("tprev") && col("t") <= col("tprev") + g
        case None    => col("t") > col("tprev")
      }
      val (nxt, n) = materialize(base.where(col("et") === st)
        .join(cur.select(col("u"), col("tprev")), "u")
        .where(inWindow)
        .groupBy(col("u")).agg(min(col("t")).as("tprev")))
      cur = nxt
      counts += ((i, st, n))
    }
    frontiers.foreach(_.unpersist(blocking = false))
    counts.toSeq.toDF("step_idx", "step", "n_users")
  }

  /** Weekly cohort retention: users cohorted by their FIRST active week,
    * then counted per (cohort_week, week_offset) — the classic retention
    * triangle. Weeks are epoch-based integer buckets (ts_ns div weekNs),
    * so cohort membership is engine- and timezone-independent. Returns
    * (cohort_week, week_offset, n_users).
    *
    * Scale shape: the distinct (user, week) relation is the only
    * event-volume shuffle; everything after is user- and cohort-sized. */
  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts_ns", weekNs: Long = 604800000000000L): DataFrame = {
    val uw = events.select(col(userCol).cast("long").as("u"),
        expr(s"$tsCol div $weekNs").as("w"))
      .distinct()
    val cohort = uw.groupBy(col("u")).agg(min(col("w")).as("cw"))
    uw.join(cohort, "u")
      .groupBy(col("cw").as("cohort_week"), (col("w") - col("cw")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
