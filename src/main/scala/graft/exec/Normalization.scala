package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model._

/** Score normalization over the hybrid intermediate relation
  * `DataFrame[query_id, subq, doc_id, score]` — the Spark re-expression of
  * the reference's phase-results normalization (SURVEY.md §2.4).
  *
  * The normalization scope is the per-(query, subquery) candidate set —
  * i.e. the union of all shards' top-K lists, NOT the full corpus
  * (reference: MinMaxScoreNormalizationTechnique.java:218-257 operates on the
  * collected TopDocs). Callers must therefore apply the per-subquery top-K
  * cut BEFORE normalizing; `HybridPipeline` enforces this ordering.
  *
  * Formulas and edge cases transcribed exactly:
  *   - min_max (MinMaxScoreNormalizationTechnique.java:260-297):
  *     n = (s - min)/(max - min); min==max==s → 1.0; n==0 → 0.001 floor;
  *     optional per-subquery lower/upper bounds, modes apply|clip|ignore
  *     (bounds/LowerBound.java, UpperBound.java).
  *   - l2 (L2ScoreNormalizationTechnique.java:36,143-145): n = s/sqrt(Σ s²);
  *     zero norm → that technique's own MIN_SCORE = 0.0 (NOT min_max's 0.001).
  *   - z_score (ZScoreNormalizationTechnique.java:206-224), edge cases in
  *     reference order: s==mean → per-subquery MAX raw score; σ==0 →
  *     per-subquery MIN raw score; else (s-mean)/σ floored at MIN_SCORE
  *     0.001 when ≤ 0 (so below-mean docs still contribute 0.001·weight
  *     to the combination instead of being skipped).
  *   - rrf (RRFNormalizationTechnique.java:77-133): n = 1/(rank_constant +
  *     rank), rank = 1-based GLOBAL position in the subquery's result list,
  *     ordered by score desc. Reference tie-breaks by (score, doc, shard);
  *     we tie-break by (score desc, doc_id asc) — documented divergence,
  *     Spark has no shard-local doc ids.
  */
object Normalization {

  val MinScore = 0.001 // MinMaxScoreNormalizationTechnique.java:50
  val SingleResultScore = 1.0

  private val bySubquery = Seq(col("query_id"), col("subq"))

  def normalize(df: DataFrame, spec: NormalizationSpec): DataFrame = spec match {
    case NormalizationSpec.MinMax(bounds) => minMax(df, bounds)
    case NormalizationSpec.L2             => l2(df)
    case NormalizationSpec.ZScore         => zScore(df)
    case NormalizationSpec.RRF(k)         => rrf(df, k)
  }

  def minMax(df: DataFrame, bounds: Seq[(ScoreBound, ScoreBound)] = Nil): DataFrame = {
    val w = Window.partitionBy(bySubquery: _*)
    val s = col("score"); val mn = col("__min"); val mx = col("__max")

    // Per-subquery bound expressions: CASE over subq index (small literal table).
    def boundCols: (Column, Column, Column, Column) = {
      if (bounds.isEmpty)
        (mn, mx, lit(false), lit(false))
      else {
        // effective min (LowerBound.determineEffectiveScore)
        val effMin = bounds.zipWithIndex.foldLeft(mn) { case (acc, ((lo, _), i)) =>
          val e =
            if (!lo.enabled) mn
            else lo.mode match {
              case BoundMode.Apply =>
                when(mx > lo.boundScore && s > lo.boundScore, lit(lo.boundScore.toDouble)).otherwise(mn)
              case BoundMode.Clip =>
                when(mx < lo.boundScore, mn).otherwise(lit(lo.boundScore.toDouble))
              case BoundMode.Ignore => mn
            }
          when(col("subq") === i, e).otherwise(acc)
        }
        val effMax = bounds.zipWithIndex.foldLeft(mx) { case (acc, ((_, hi), i)) =>
          val e =
            if (!hi.enabled) mx
            else hi.mode match {
              case BoundMode.Apply =>
                when(mn < hi.boundScore && s < hi.boundScore, lit(hi.boundScore.toDouble)).otherwise(mx)
              case BoundMode.Clip =>
                when(mn > hi.boundScore, mx).otherwise(lit(hi.boundScore.toDouble))
              case BoundMode.Ignore => mx
            }
          when(col("subq") === i, e).otherwise(acc)
        }
        val clipLo = bounds.zipWithIndex.foldLeft(lit(false)) { case (acc, ((lo, _), i)) =>
          when(col("subq") === i, lit(lo.enabled && lo.mode == BoundMode.Clip)).otherwise(acc)
        }
        val clipHi = bounds.zipWithIndex.foldLeft(lit(false)) { case (acc, ((_, hi), i)) =>
          when(col("subq") === i, lit(hi.enabled && hi.mode == BoundMode.Clip)).otherwise(acc)
        }
        (effMin, effMax, clipLo, clipHi)
      }
    }

    val withStats = df
      .withColumn("__min", min(s).over(w))
      .withColumn("__max", max(s).over(w))
    val (effMin, effMax, clipLo, clipHi) = boundCols
    val raw = (s - effMin) / (effMax - effMin)
    // edge-case predicates compare FLOAT-cast values (the reference's
    // Floats.compare runs on float-cast stats — see the zScore note); in
    // particular the MIN_SCORE floor fires whenever the reference's FLOAT
    // subtraction s_f - effMin_f is zero, i.e. s_f == effMin_f, even when
    // the doubles differ in the last decimals
    def f(c: Column): Column = c.cast("float")
    val normalized =
      when(f(mx) === f(mn) && f(mx) === f(s), lit(SingleResultScore)) // single/all-equal score
        .when(clipLo && f(s) < f(effMin), lit(MinScore)) // shouldClipToBound lower
        .when(clipHi && f(s) > f(effMax), lit(1.0)) // shouldClipToBound upper → MAX_SCORE
        .when(f(effMax) === f(effMin), lit(SingleResultScore))
        .otherwise(when(f(s) === f(effMin), lit(MinScore)).otherwise(raw))
    withStats.withColumn("score", normalized).drop("__min", "__max")
  }

  def l2(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(bySubquery: _*)
    val norm = sqrt(sum(col("score") * col("score")).over(w))
    df.withColumn(
      "score",
      when(norm === 0.0, lit(0.0)).otherwise(col("score") / norm))
  }

  def zScore(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(bySubquery: _*)
    val mean = avg(col("score")).over(w)
    // commons-math DescriptiveStatistics.getStandardDeviation is the SAMPLE
    // stddev (n-1 denominator) — ZScoreNormalizationTechnique.java:184-193.
    val sd = stddev_samp(col("score")).over(w)
    val mx = max(col("score")).over(w)
    val mn = min(col("score")).over(w)
    val z = (col("score") - mean) / sd
    // edge-case predicates compare FLOAT-cast values: the reference casts
    // its double-precision stats to float before Floats.compare, so a score
    // equal to the float mean (but not the double mean) must take the max
    // branch — a full-magnitude divergence if compared in double
    df.withColumn(
      "score",
      when(col("score").cast("float") === mean.cast("float"), mx)
        .when(isnull(sd) || sd.cast("float") === lit(0.0f), mn)
        .otherwise(when(z <= 0.0, lit(MinScore)).otherwise(z)))
  }

  def rrf(df: DataFrame, rankConstant: Int = HybridLimits.DefaultRankConstant): DataFrame = {
    val w = Window.partitionBy(bySubquery: _*).orderBy(col("score").desc, col("doc_id").asc)
    df.withColumn("score", lit(1.0) / (lit(rankConstant.toDouble) + row_number().over(w)))
  }
}
