package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sixteenth bank (round 11): the incremental-ingest dedup family — the
  * production shape (dedup the arriving batch against the indexed corpus,
  * never re-dedup the corpus; the dedup analogue of q_seismic_incremental
  * / q_ann_ivf_incremental):
  *   - q_dedup_minhash_delta: token-level approximate near-dups vs the
  *     written MinHash index ([[graft.dedup.MinhashIndex.deltaPairs]]);
  *   - q_dedup_winnow_delta: substring-level verbatim overlap vs the
  *     written winnow-fingerprint index ([[graft.dedup.WinnowIndex]]);
  *   - q_dedup_embedding_delta: semantic cosine near-dups vs the written
  *     hyperplane-bucket embedding index ([[graft.dedup.EmbeddingIndex]]);
  *   - q_dedup_clusters_delta: yesterday's cluster assignment + only the
  *     delta's pairs → today's assignment
  *     ([[graft.dedup.Dedup.resolveClustersIncremental]], the keep-set leg);
  *   - q_stream_dedup_minhash: the foreachBatch flush loop
  *     ([[graft.dedup.MinhashIndex.ingestStream]]) from an empty index.
  *
  * Oracles are DERIVED, never re-written (the Queries15 anti-drift
  * protocol): each delta gate inserts one candidate-restriction clause
  * into its batch sibling's SQL behind a shape assert that fails loud on
  * drift; the stream and clusters gates are batching-invariant /
  * path-compression-invariant, so they ride their batch oracles VERBATIM
  * (old×old pairs were the base index's own dedup problem — old×new and
  * new×new are the delta call's contract). */
object Queries16 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // arriving batch = the held-out tenth of documents; the index over the
    // other nine tenths is an ingest artifact (SparkEntry memo, built in
    // Bench's warmup pass) — the timed query is the DELTA search: one
    // postings scan + one sketches scan, both broadcast-joined against
    // delta-sized relations, zero index shuffles.
    "q_dedup_minhash_delta" -> ((s, dir) =>
      graft.dedup.MinhashIndex.deltaPairs(
        s, SparkEntry.minhashIndexPath(s, dir),
        t(s, dir, "documents").where(col("doc_id") % 10 === 7),
        threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))),

    // the boilerplate-regime lever on the delta path: band buckets over
    // 100 members (counted over base + delta, the whole-corpus semantics)
    // emit no candidates — measured 273 -> 15 MB shuffle at x30
    // boilerplate (bench/scale_r11i_boilerplate.json)
    "q_dedup_minhash_delta_capped" -> ((s, dir) =>
      graft.dedup.MinhashIndex.deltaPairs(
        s, SparkEntry.minhashIndexPath(s, dir),
        t(s, dir, "documents").where(col("doc_id") % 10 === 7),
        threshold = 0.5, maxBucket = Some(100))
        .orderBy(col("id_a"), col("id_b"))),

    // semantic leg of the delta-index family: arriving vectors checked for
    // cosine near-dups against the indexed corpus via the same seeded
    // hyperplane buckets as q_dedup_embedding_lsh (parameters match)
    "q_dedup_embedding_delta" -> ((s, dir) =>
      graft.dedup.EmbeddingIndex.deltaPairs(
        s, SparkEntry.embeddingIndexPath(s, dir),
        t(s, dir, "embeddings").where(col("vec_id") % 10 === 7),
        threshold = 0.45)
        .orderBy(col("id_a"), col("id_b"))),

    // incremental cluster maintenance: base-base pairs are resolved FIRST
    // (yesterday's assignment), then only the delta-touching pairs fold in
    // via resolveClustersIncremental (star edges + new pairs) — the
    // union-find path-compression identity CC(star(CC(E1)) u E2) =
    // CC(E1 u E2) makes the output the batch q_dedup_clusters relation,
    // so this gate rides its oracle verbatim
    "q_dedup_clusters_delta" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.dedup.Dedup
        .ngramJaccardPairs(docs, threshold = 0.5)
        .select(col("id_a"), col("id_b")).persist()
      pairs.count() // one ngram join feeds both splits
      val isD = (c: org.apache.spark.sql.Column) => c % 10 === 7
      val prev = graft.dedup.Dedup.resolveClusters(
        pairs.where(!isD(col("id_a")) && !isD(col("id_b"))),
        docs.where(col("doc_id") % 10 =!= 7).select(col("doc_id").as("id")))
      val out = graft.dedup.Dedup.resolveClustersIncremental(
        prev, pairs.where(isD(col("id_a")) || isD(col("id_b"))),
        docs.select(col("doc_id").as("id")))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
        .where(col("cluster_size") > 1)
        .orderBy(col("cluster_id"))
      graft.dedup.Dedup.finishReleasingPublic(out, pairs)
    }),

    // streaming near-dup ingest: the corpus streams through
    // foreachBatch(deltaPairs + append) from an EMPTY index — the emitted
    // pair union is batching-invariant and equals whole-corpus minhashLsh,
    // so this gate rides q_dedup_minhash's oracle verbatim (fresh index +
    // checkpoint per invocation: the stream must start empty every run)
    // delta overlap detection against the written winnow-fingerprint
    // index: the exact substring-level sibling of q_dedup_minhash_delta
    // (same base/delta split; n_shared is the postings-join match count,
    // no verification payload) — parameters match q_dedup_winnow
    "q_dedup_winnow_delta" -> ((s, dir) =>
      graft.dedup.WinnowIndex.deltaPairs(
        s, SparkEntry.winnowIndexPath(s, dir),
        t(s, dir, "documents").where(col("doc_id") % 10 === 7),
        minShared = Queries12.WinnowMinShared)
        .orderBy(col("id_a"), col("id_b"))),

    "q_stream_dedup_minhash" -> ((s, dir) => {
      val root = SparkEntry.streamScratchDir("mh_stream")
      val idx = s"$root/index"
      val out = s"$root/pairs"
      val docs = t(s, dir, "documents")
      graft.dedup.MinhashIndex.write(docs.limit(0), idx)
      graft.dedup.MinhashIndex.ingestStream(
        Queries6.streamOf(s, dir, "documents"), idx, out, threshold = 0.5)
      s.read.parquet(out).dropDuplicates("id_a", "id_b")
        .orderBy(col("id_a"), col("id_b"))
    }))

  private val CandAnchor =
    "ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id"

  def oracleSql: Map[String, String] = Map(
    "q_dedup_minhash_delta" -> {
      val base = QueriesExtra.oracleSql("q_dedup_minhash")
      require(base.sliding(CandAnchor.length).count(_ == CandAnchor) == 1,
        "q_dedup_minhash oracle candidate clause drifted — repin the " +
          "q_dedup_minhash_delta derivation anchor")
      base.replace(CandAnchor,
        CandAnchor + "\n   AND (a.doc_id % 10 = 7 OR b.doc_id % 10 = 7)")
    },
    // streaming-from-empty reproduces the whole-corpus relation exactly
    "q_stream_dedup_minhash" -> QueriesExtra.oracleSql("q_dedup_minhash"),

    // the capped oracle (Queries15's derived bucket-population filter)
    // with the same delta restriction as the uncapped gate
    "q_dedup_minhash_delta_capped" -> {
      val base = Queries15.oracleSql("q_dedup_minhash_capped")
      require(base.sliding(CandAnchor.length).count(_ == CandAnchor) == 1,
        "q_dedup_minhash_capped oracle candidate clause drifted — repin " +
          "the q_dedup_minhash_delta_capped derivation anchor")
      base.replace(CandAnchor,
        CandAnchor + "\n   AND (a.doc_id % 10 = 7 OR b.doc_id % 10 = 7)")
    },

    // the incremental path is output-equivalent to batch CC over all pairs
    "q_dedup_clusters_delta" -> Queries4.oracleSql("q_dedup_clusters"),

    "q_dedup_embedding_delta" -> {
      val base = QueriesExtra.oracleSql("q_dedup_embedding_lsh")
      require(base.sliding(EmbAnchor.length).count(_ == EmbAnchor) == 1,
        "q_dedup_embedding_lsh oracle candidate clause drifted — repin the " +
          "q_dedup_embedding_delta derivation anchor")
      base.replace(EmbAnchor,
        EmbAnchor + "\n   AND (a.vec_id % 10 = 7 OR b.vec_id % 10 = 7)")
    },

    "q_dedup_winnow_delta" -> {
      val base = Queries12.oracleSql("q_dedup_winnow")
      require(base.sliding(WinnowAnchor.length).count(_ == WinnowAnchor) == 1,
        "q_dedup_winnow oracle join clause drifted — repin the " +
          "q_dedup_winnow_delta derivation anchor")
      base.replace(WinnowAnchor,
        WinnowAnchor + "\n             AND (a.doc_id % 10 = 7 OR b.doc_id % 10 = 7)")
    })

  private val WinnowAnchor = "ON a.gh = b.gh AND a.doc_id < b.doc_id"
  private val EmbAnchor = "ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id"
}
