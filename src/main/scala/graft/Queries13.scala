package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.events.EventAnalytics

/** Thirteenth bank (round 8, second pass): event analytics — ordered-step
  * funnels and weekly cohort retention over the normalized events
  * relation. Pure integer/relational pipelines; the oracles are direct
  * SQL restatements (epoch_us(ts)*1000 is the shared nanos norm). */
object Queries13 {

  private val FunnelSteps = Seq("view", "click", "purchase")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // first-touch funnel: first view, first click AFTER it, first
    // purchase after that
    "q_funnel" -> ((s, dir) =>
      EventAnalytics.funnel(SparkEntry.eventsWithTsNs(s, dir), FunnelSteps)
        .orderBy(col("step_idx"))),

    // weekly retention triangle: cohort = first active epoch-week
    "q_retention_cohorts" -> ((s, dir) =>
      EventAnalytics.retentionCohorts(SparkEntry.eventsWithTsNs(s, dir))
        .orderBy(col("cohort_week"), col("week_offset"))),

    // semi-structured extraction: the JSON props payload parsed with
    // schema-on-read (from_json), then a per-type profile of the field —
    // the schemaless-column pattern every event pipeline hits
    "q_props_stats" -> ((s, dir) =>
      SparkEntry.eventsWithTsNs(s, dir)
        .withColumn("k", expr("from_json(props, 'k LONG').k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type")))
  )

  def oracleSql: Map[String, String] = Map(
    "q_funnel" ->
      """WITH fe AS (SELECT user_id AS u, event_type AS et, epoch_us(ts) * 1000 AS t
        |            FROM events),
        |f0 AS (SELECT u, min(t) AS tp FROM fe WHERE et = 'view' GROUP BY u),
        |f1 AS (SELECT fe.u, min(fe.t) AS tp FROM fe JOIN f0 USING (u)
        |       WHERE fe.et = 'click' AND fe.t > f0.tp GROUP BY fe.u),
        |f2 AS (SELECT fe.u, min(fe.t) AS tp FROM fe JOIN f1 USING (u)
        |       WHERE fe.et = 'purchase' AND fe.t > f1.tp GROUP BY fe.u)
        |SELECT step_idx, step, n_users FROM (
        |  SELECT 0 AS step_idx, 'view' AS step, CAST(count(*) AS BIGINT) AS n_users FROM f0
        |  UNION ALL
        |  SELECT 1, 'click', CAST(count(*) AS BIGINT) FROM f1
        |  UNION ALL
        |  SELECT 2, 'purchase', CAST(count(*) AS BIGINT) FROM f2)
        |ORDER BY step_idx""".stripMargin,

    // json_valid + json_type + try_cast mirror Spark's type-strict
    // from_json: malformed JSON or a non-integer-typed k (quoted "12",
    // booleans, doubles — which DuckDB's bare try_cast would coerce but
    // from_json(.., 'k LONG') yields NULL for) degrade to NULL on BOTH
    // engines (parity survives a testdata regeneration)
    "q_props_stats" ->
      """WITH ev AS (
        |  SELECT event_type,
        |         CASE WHEN json_valid(props)
        |               AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
        |              THEN try_cast(json_extract(props, '$.k') AS BIGINT) END AS k
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       CAST(min(k) AS BIGINT) AS min_k,
        |       CAST(max(k) AS BIGINT) AS max_k
        |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_retention_cohorts" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id AS u,
        |         (epoch_us(ts) * 1000) // 604800000000000 AS w
        |  FROM events
        |), ch AS (SELECT u, min(w) AS cw FROM uw GROUP BY u)
        |SELECT cw AS cohort_week, w - cw AS week_offset,
        |       CAST(count(*) AS BIGINT) AS n_users
        |FROM uw JOIN ch USING (u)
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin
  )
}
