package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ingest.Enrich
import graft.text.TextAnalysis

/** Structured-Streaming ingest: the same enrichment pipeline the batch path
  * uses (chunk → embed → encode → quality signals), applied to a streaming
  * DataFrame. The reference is batch-only (ingest happens per bulk request);
  * streaming ingest is the natural Spark extension for continuous corpus
  * builds — `readStream` → enrich → `writeStream` into the corpus table.
  *
  * All enrichment transforms are stateless projections, so they run
  * unchanged on a stream (no watermark needed). The windowed aggregation
  * demonstrates stateful processing: per-source document counts over event
  * time with a watermark bounding state.
  */
object StreamingEnrich {

  /** Stateless enrichment — identical logic for batch and stream frames. */
  def enrich(docs: DataFrame, dim: Int = Enrich.DefaultDim): DataFrame = {
    val enriched = docs
      .withColumn("embedding", Enrich.embedUdf(dim)(col("text")))
      .withColumn("tokens", Enrich.encodeUdf(col("text")))
    TextAnalysis.langId(enriched)
      .select(docs.columns.map(col) ++ Seq(
        col("embedding"), col("tokens"), col("pred_lang")): _*)
  }

  /** Stateful demo: per-(source, window) doc counts with a watermark.
    * Requires an event-time column `ts`. */
  def countsPerSourceWindow(docs: DataFrame, windowDuration: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .groupBy(col("source"), window(col("ts"), windowDuration))
      .agg(count(lit(1)).as("n_docs"), avg(length(col("text"))).as("avg_len"))
}

/** Streaming exact dedup: first-writer-wins per content hash with
  * `flatMapGroupsWithState` — the streaming form of the batch
  * `Dedup.exact` groupBy. State per hash is (keep_id, dup_count) and
  * survives across micro-batches, so a duplicate arriving hours later is
  * still flagged against the original. At scale the state store is
  * RocksDB-backed and keyed by the 16-byte hash — state size is bounded by
  * DISTINCT content, not stream length; pair with a TTL timeout when the
  * dedup horizon is finite.
  */
object StreamingDedup {

  case class DocIn(doc_id: Long, text_hash: String)
  case class SeenState(keepId: Long, dupCount: Long)
  case class DedupOut(doc_id: Long, text_hash: String, is_duplicate: Boolean, keep_id: Long)

  def update(
      hash: String, docs: Iterator[DocIn],
      state: GroupState[SeenState]): Iterator[DedupOut] = {
    var st = state.getOption.orNull
    val out = docs.toSeq.sortBy(_.doc_id).map { d =>
      if (st == null) {
        st = SeenState(d.doc_id, 0L)
        DedupOut(d.doc_id, hash, is_duplicate = false, keep_id = d.doc_id)
      } else {
        st = st.copy(dupCount = st.dupCount + 1)
        DedupOut(d.doc_id, hash, is_duplicate = true, keep_id = st.keepId)
      }
    }
    state.update(st)
    out.iterator
  }

  /** docs(doc_id, text_hash) → per-doc duplicate flag + canonical keep id. */
  def dedupStream(docs: Dataset[DocIn]): Dataset[DedupOut] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.text_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}

/** Custom streaming state: continuous per-user sessionization with
  * `mapGroupsWithState` — the streaming form of the batch gaps-and-islands
  * sessionizer (q_sessionize). State per user survives across micro-batches;
  * a new session opens when the gap to the previous event exceeds `gapNs`.
  */
object StreamingSessionize {

  case class Event(user_id: Long, ts_ns: Long)
  case class SessionState(nSessions: Long, lastTs: Long, nEvents: Long)
  case class SessionUpdate(user_id: Long, n_sessions: Long, n_events: Long)

  def update(gapNs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): SessionUpdate = {
    var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
    events.toSeq.sortBy(e => e.ts_ns).foreach { e =>
      val newSession = st.nEvents == 0L || e.ts_ns - st.lastTs > gapNs
      st = SessionState(
        nSessions = st.nSessions + (if (newSession) 1 else 0),
        lastTs = math.max(st.lastTs, e.ts_ns),
        nEvents = st.nEvents + 1)
    }
    state.update(st)
    SessionUpdate(userId, st.nSessions, st.nEvents)
  }

  /** events(user_id, ts_ns) → running (user_id, n_sessions, n_events). */
  def sessionize(events: Dataset[Event], gapNs: Long = 30L * 60 * 1000000000L): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update(gapNs))
  }

  /** Append-mode form: emits the post-batch running totals per user seen in
    * the batch (flatMapGroupsWithState — mapGroupsWithState forces Update
    * mode, which the memory/file sinks reject). Under Trigger.AvailableNow
    * on a static source this is one emission per user = the batch
    * gaps-and-islands totals, which is what the driver gate verifies. */
  def sessionizeAppend(events: Dataset[Event],
      gapNs: Long = 30L * 60 * 1000000000L): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          Iterator.single(update(gapNs)(uid, evs, state))
      }
  }
}
