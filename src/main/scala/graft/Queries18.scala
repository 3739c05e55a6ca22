package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, EmbeddingIndex, WinnowIndex}

/** Eighteenth bank (round 13): the full streaming dedup-to-clusters
  * pipeline on the WINNOW and EMBEDDING legs — VERDICT r12 task #6. The
  * per-batch incremental cluster-assignment fold ([[graft.dedup
  * .ClusterFold]]) is leg-agnostic (it consumes pairs), so extending the
  * minhash-only `ingestStreamClustered` to the other two index families
  * is a pair-producer swap, and the Queries17 gate protocol transfers
  * verbatim:
  *
  *   - a BATCH sibling per leg pins the whole-corpus cluster closure
  *     (connected components over that leg's pair relation — the
  *     q_dedup_clusters_minhash pattern);
  *   - the STREAMING gate rides the batch sibling's oracle VERBATIM: the
  *     leg's pair stream is batching-invariant, so per-batch
  *     CC(star(CC(E₁)) ∪ E₂) = CC(E₁ ∪ E₂) makes the published
  *     assignment equal the whole-corpus closure by induction.
  *
  * Oracle protocol: each closure SQL is MECHANICALLY derived from the
  * leg's pair oracle (strip the pinned ORDER-BY tail, nest as the `pr`
  * CTE of the recursive closure — the minhashClustersSql derivation,
  * generalized), so the fingerprint family and closure semantics can
  * never drift from their pair siblings. */
object Queries18 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def clusterSizes(labels: DataFrame): DataFrame =
    labels
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .where(col("cluster_size") > 1)
      .orderBy(col("cluster_id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // batch sibling: connected components over the winnow pair relation
    // (verbatim-overlap clusters — the substring-dedup resolution step)
    "q_dedup_clusters_winnow" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      clusterSizes(Dedup.resolveClusters(
        Dedup.winnowPairs(docs, k = Queries12.WinnowK, w = Queries12.WinnowW,
          minShared = Queries12.WinnowMinShared)
          .select(col("id_a"), col("id_b")),
        docs.select(col("doc_id").as("id"))))
    }),

    // batch sibling: connected components over the embedding-LSH pair
    // relation (semantic near-dup clusters)
    "q_dedup_clusters_embedding" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      clusterSizes(Dedup.resolveClusters(
        Dedup.embeddingNearDupLsh(emb, dim = 64, threshold = 0.45,
          nbits = 4, tables = 8)
          .select(col("id_a"), col("id_b")),
        emb.select(col("vec_id").as("id"))))
    }),

    // streaming winnow dedup-to-clusters: per micro-batch — deltaPairs
    // against the index, postings folded in, assignment incrementally
    // maintained; from an empty index the published assignment equals the
    // whole-corpus closure (batching-invariant n_shared + per-batch CC
    // identity), so this rides the batch sibling's oracle verbatim
    "q_stream_dedup_clusters_winnow" -> ((s, dir) => {
      val root = SparkEntry.streamScratchDir("clw_stream")
      val idx = s"$root/index"
      val cl = s"$root/clusters"
      val docs = t(s, dir, "documents")
      WinnowIndex.write(docs.limit(0), idx,
        k = Queries12.WinnowK, w = Queries12.WinnowW)
      WinnowIndex.ingestStreamClustered(
        Queries6.streamOf(s, dir, "documents"), idx, cl,
        minShared = Queries12.WinnowMinShared)
      clusterSizes(WinnowIndex.storedClusters(s, cl))
    }),

    // streaming embedding dedup-to-clusters: same pipeline on the
    // semantic leg (cross-batch members merge through the group-keyed
    // sketches, cosine deterministic → batching-invariant pair stream)
    "q_stream_dedup_clusters_embedding" -> ((s, dir) => {
      val root = SparkEntry.streamScratchDir("cle_stream")
      val idx = s"$root/index"
      val cl = s"$root/clusters"
      val emb = t(s, dir, "embeddings")
      EmbeddingIndex.write(emb.limit(0), idx, dim = 64, nbits = 4, tables = 8)
      EmbeddingIndex.ingestStreamClustered(
        Queries6.streamOf(s, dir, "embeddings"), idx, cl, threshold = 0.45)
      clusterSizes(EmbeddingIndex.storedClusters(s, cl))
    }))

  /** Wrap a pair oracle in the recursive connected-components closure —
    * the minhashClustersSql derivation generalized over (pair SQL, id
    * universe). The pair SQL nests as a CTE body (DuckDB allows WITH
    * inside a CTE); extra pair columns (n_shared, cosine) ride along
    * unused. */
  private def ccClosureSql(pairSql: String, gate: String,
      idsTable: String, idCol: String): String = {
    val tail = "ORDER BY id_a, id_b"
    require(pairSql.trim.endsWith(tail),
      s"$gate pair-oracle tail drifted — repin the cluster-closure " +
        "derivation anchor")
    val body = pairSql.trim.stripSuffix(tail).trim
    s"""WITH RECURSIVE pr AS (
       |$body
       |), edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pr
       |  UNION ALL SELECT id_b, id_a FROM pr
       |), reach(src, dst) AS (
       |  SELECT $idCol, $idCol FROM $idsTable
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
       |), labels AS (
       |  SELECT src AS id, min(dst) AS cluster_id FROM reach GROUP BY src
       |)
       |SELECT cluster_id, count(*) AS cluster_size
       |FROM labels GROUP BY cluster_id HAVING count(*) > 1
       |ORDER BY cluster_id""".stripMargin
  }

  private lazy val winnowClustersSql: String = ccClosureSql(
    Queries12.oracleSql("q_dedup_winnow"), "q_dedup_winnow",
    "documents", "doc_id")

  private lazy val embeddingClustersSql: String = ccClosureSql(
    QueriesExtra.oracleSql("q_dedup_embedding_lsh"), "q_dedup_embedding_lsh",
    "embeddings", "vec_id")

  def oracleSql: Map[String, String] = Map(
    "q_dedup_clusters_winnow" -> winnowClustersSql,
    "q_dedup_clusters_embedding" -> embeddingClustersSql,
    // streaming-from-empty equals the whole-corpus closure (per-batch CC
    // identity — batching-invariant by induction, the Queries17 protocol)
    "q_stream_dedup_clusters_winnow" -> winnowClustersSql,
    "q_stream_dedup_clusters_embedding" -> embeddingClustersSql)
}
