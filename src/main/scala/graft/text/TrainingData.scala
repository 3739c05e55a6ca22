package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ml.HashEmbedder

/** Training-data pipeline operators beyond the reference's search surface:
  * deterministic stratified sampling (corpus mixing) and greedy sequence
  * packing. Both are designed to replay identically on any cluster layout —
  * sampling is a pure per-row hash predicate, packing is keyed by an
  * explicit shard so the greedy scan order is data-defined, not
  * partition-defined. */
object TrainingData {

  /** Sampling-hash modulus. MUST divide 2^32 so the unsigned SQL modulus
    * equals Java floorMod of the signed 32-bit FNV hash (same trick as
    * HashEmbedder's dim). */
  val SampleMod = 1024

  /** Deterministic stratified sampling / corpus mixing: keep a row iff
    * fnv("doc:<id>") mod 1024 < quota(stratum), quotas in 1024ths. The
    * hash is on the DOCUMENT ID, not a random draw — the sample is
    * reproducible across runs, clusters, and engines (the DuckDB oracle
    * computes the identical FNV-1a), and a doc keeps/loses membership
    * independently of partitioning. A per-language quota map IS a corpus
    * mixing spec ("40% en, 30% es, ..."): one scan, no shuffle, the
    * filter is row-local (a cheap UDF over (id) — the scan still prunes
    * columns; at 100 TB this is the mandatory one-pass shape). Rows in
    * strata absent from the map keep `defaultQuota`. */
  def stratifiedSample(df: DataFrame, strataCol: String, quotas: Map[String, Int],
      defaultQuota: Int = 0, idCol: String = "doc_id", salt: String = "doc:"): DataFrame = {
    require(quotas.values.forall(q => q >= 0 && q <= SampleMod),
      s"quotas are in ${SampleMod}ths and must sit in [0, $SampleMod]")
    val bucket = udf((id: Long) => math.floorMod(HashEmbedder.tokenHash(salt + id), SampleMod))
    val quotaCol: Column = quotas.foldLeft(lit(defaultQuota)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.where(bucket(col(idCol)) < quotaCol)
  }

  /** Greedy sequential sequence packing: assign docs to fixed-token-budget
    * packs (LLM pretraining sample packing). Docs are sharded by
    * doc_id mod nShards; WITHIN a shard, docs are scanned in doc_id order
    * and greedily accumulated — a doc that would overflow the running pack
    * starts the next one (an over-budget doc occupies a pack alone).
    *
    * Scale shape: shard is an explicit key, so the scan is
    * repartition(shard) + sortWithinPartitions + one streaming
    * mapPartitions pass — no global sort, no driver state, and shard
    * boundaries (not partition boundaries) reset the accumulator, so the
    * result is identical at any parallelism. nShards bounds per-task
    * sequentiality: at 100 TB you raise nShards, not executor memory.
    * Returns (doc_id, shard, pack_id, n_tokens). */
  def packGreedy(df: DataFrame, tokenBudget: Int, nShards: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(tokenBudget > 0 && nShards > 0, "tokenBudget and nShards must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val tokCount = udf((s: String) => HashEmbedder.tokenize(s).length)
    df.select(col(idCol).cast("long").as("doc_id"),
        (col(idCol) % nShards).cast("int").as("shard"),
        tokCount(col(textCol)).as("n_tokens"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        var curShard = Int.MinValue
        var pack = 0
        var acc = 0
        it.map { case (id, shard, tok) =>
          if (shard != curShard) { curShard = shard; pack = 0; acc = tok }
          else if (acc + tok > tokenBudget) { pack += 1; acc = tok }
          else acc += tok
          (id, shard, pack, tok)
        }
      }
      .toDF("doc_id", "shard", "pack_id", "n_tokens")
  }
}
