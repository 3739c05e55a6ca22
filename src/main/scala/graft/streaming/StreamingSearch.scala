package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming query serving: a STREAM of sparse queries answered against the
  * STATIC postings index — the Structured-Streaming form of the
  * query-set-at-a-time serving posture (SparseRetrieval.batchTopK). Each
  * arriving file is one query batch; the stream-static broadcast join on
  * `token` prunes the postings scan to the batch's tokens, and per-query
  * top-k finalizes inside flatMapGroupsWithState.
  *
  * Contract: a query's rows arrive atomically within one micro-batch (one
  * file = one query batch — the file-landing serving pattern; the reference
  * analogue is one _msearch request = one unit). State is therefore unused
  * (NoTimeout, no cross-batch accumulation) — what the operator buys over
  * foreachBatch is a single declarative plan the engine schedules.
  */
object StreamingSearch {

  case class Hit(query_id: Long, doc_id: Long, score: Double, rank: Int)

  /** queryStream: streaming (query_id, token, qw) rows; postings: static
    * (token, doc_id, weight). Emits (query_id, doc_id, score round-6,
    * rank ≤ k) per served query. */
  def serveSparse(queryStream: DataFrame, postings: DataFrame, k: Int): Dataset[Hit] = {
    val spark = postings.sparkSession
    import spark.implicits._
    val joined = queryStream
      .join(postings, "token")
      .select(col("query_id").cast("long"), col("doc_id").cast("long"),
        (col("weight").cast("double") * col("qw").cast("double")).as("prod"))
      .as[(Long, Long, Double)]
    joined
      .groupByKey(_._1)
      .flatMapGroupsWithState[Int, Hit](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid: Long, rows: Iterator[(Long, Long, Double)], state: GroupState[Int]) =>
          // One-file-one-batch contract, ENFORCED (was only documented): a
          // query's token rows must all arrive in the same micro-batch —
          // if qid shows up again in a later batch this operator would emit
          // a SECOND top-k for it computed from the fragment alone. Fail
          // loud instead of silently serving partial results.
          if (state.exists)
            throw new IllegalStateException(
              s"query_id $qid spans micro-batches — stage each query batch as one file " +
                "(one file = one trigger; see q_stream_search staging)")
          state.update(1)
          val acc = scala.collection.mutable.HashMap.empty[Long, Double]
          rows.foreach { case (_, doc, p) =>
            acc.update(doc, acc.getOrElse(doc, 0.0) + p)
          }
          acc.iterator
            .map { case (doc, s) =>
              (doc, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
            }
            .filter(_._2 > 0.0)
            .toArray
            .sortBy { case (doc, s) => (-s, doc) }
            .take(k)
            .zipWithIndex
            .map { case ((doc, s), i) => Hit(qid, doc, s, i + 1) }
            .iterator
      }
  }
}
