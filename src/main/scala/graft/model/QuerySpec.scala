package graft.model

/** Logical query model for the engine — the Spark counterpart of the
  * reference's QueryBuilder tree + search-pipeline configuration
  * (reference: query/HybridQueryBuilder.java, processor/NormalizationProcessor.java).
  * Validation rules transcribed from:
  *   - max 5 subqueries          (HybridQueryBuilder.java:67)
  *   - no nested hybrid          (HybridQueryPhaseSearcher.java:93-181)
  *   - boost forbidden on hybrid (HybridQueryBuilder.java:255-261)
  *   - weights length must match #subqueries (combination/ScoreCombinationUtil.java:98)
  *   - valid (normalization, combination) pairs
  *     (ScoreNormalizationFactory.java:27-58, ScoreCombinationFactory.java:22-30)
  */
object HybridLimits {
  val MaxSubqueries = 5
  val DefaultRankConstant = 60
  val MinRankConstant = 1
  val MaxRankConstant = 10000
  val DefaultK = 10 // NeuralQueryBuilder.java:137 DEFAULT_K
  val MaxResultWindow = 10000
}

sealed trait BoundMode
object BoundMode {
  case object Apply extends BoundMode
  case object Clip extends BoundMode
  case object Ignore extends BoundMode
  def fromString(s: String): BoundMode = s.toLowerCase match {
    case "apply" | "" => Apply
    case "clip"       => Clip
    case "ignore"     => Ignore
    case other        => throw new IllegalArgumentException(s"invalid mode: $other")
  }
}

/** Per-subquery score bound for min_max normalization
  * (normalization/bounds/LowerBound.java, UpperBound.java). */
case class ScoreBound(enabled: Boolean, mode: BoundMode, boundScore: Float)
object ScoreBound {
  val disabledLower: ScoreBound = ScoreBound(enabled = false, BoundMode.Apply, 0.0f)
  val disabledUpper: ScoreBound = ScoreBound(enabled = false, BoundMode.Apply, 1.0f)
}

sealed trait NormalizationSpec { def name: String }
object NormalizationSpec {
  case class MinMax(bounds: Seq[(ScoreBound, ScoreBound)] = Nil) extends NormalizationSpec { val name = "min_max" }
  case object L2 extends NormalizationSpec { val name = "l2" }
  case object ZScore extends NormalizationSpec { val name = "z_score" }
  case class RRF(rankConstant: Int = HybridLimits.DefaultRankConstant) extends NormalizationSpec {
    require(
      rankConstant >= HybridLimits.MinRankConstant && rankConstant <= HybridLimits.MaxRankConstant,
      s"rank constant must be in [${HybridLimits.MinRankConstant}, ${HybridLimits.MaxRankConstant}]")
    val name = "rrf"
  }
  def fromString(s: String): NormalizationSpec = s match {
    case "min_max" => MinMax()
    case "l2"      => L2
    case "z_score" => ZScore
    case "rrf"     => RRF()
    case other     => throw new IllegalArgumentException(s"unknown normalization technique: $other")
  }
}

sealed trait CombinationSpec { def name: String }
object CombinationSpec {
  case class ArithmeticMean(weights: Option[Seq[Double]] = None) extends CombinationSpec { val name = "arithmetic_mean" }
  case class GeometricMean(weights: Option[Seq[Double]] = None) extends CombinationSpec { val name = "geometric_mean" }
  case class HarmonicMean(weights: Option[Seq[Double]] = None) extends CombinationSpec { val name = "harmonic_mean" }
  case class RRF(weights: Option[Seq[Double]] = None) extends CombinationSpec { val name = "rrf" }
  def weightsOf(c: CombinationSpec): Option[Seq[Double]] = c match {
    case ArithmeticMean(w) => w
    case GeometricMean(w)  => w
    case HarmonicMean(w)   => w
    case RRF(w)            => w
  }
}

object HybridValidation {
  /** (normalization, combination) validity table — ScoreNormalizationFactory.java:27-58. */
  def validPair(n: NormalizationSpec, c: CombinationSpec): Boolean = (n, c) match {
    case (_: NormalizationSpec.MinMax, _: CombinationSpec.ArithmeticMean) => true
    case (_: NormalizationSpec.MinMax, _: CombinationSpec.GeometricMean)  => true
    case (_: NormalizationSpec.MinMax, _: CombinationSpec.HarmonicMean)   => true
    case (NormalizationSpec.L2, _: CombinationSpec.ArithmeticMean)        => true
    case (NormalizationSpec.L2, _: CombinationSpec.GeometricMean)         => true
    case (NormalizationSpec.L2, _: CombinationSpec.HarmonicMean)          => true
    case (NormalizationSpec.ZScore, _: CombinationSpec.ArithmeticMean)    => true
    case (_: NormalizationSpec.RRF, _: CombinationSpec.RRF)               => true
    case _                                                                => false
  }

  def validate(
      numSubqueries: Int,
      norm: NormalizationSpec,
      comb: CombinationSpec,
      paginationDepth: Option[Int]): Unit = {
    require(numSubqueries >= 1, "hybrid query must have at least one subquery")
    require(
      numSubqueries <= HybridLimits.MaxSubqueries,
      s"Number of sub-queries exceeds maximum supported by [hybrid] query: ${HybridLimits.MaxSubqueries}")
    require(validPair(norm, comb), s"unsupported technique combination: ${norm.name} + ${comb.name}")
    // MinMaxScoreNormalizationTechnique bounds-count check: the reference
    // throws when the bounds array size differs from the subquery count.
    norm match {
      case NormalizationSpec.MinMax(bounds) if bounds.nonEmpty =>
        require(
          bounds.length == numSubqueries,
          s"expected bounds array to contain $numSubqueries elements matching the number of sub-queries, but found ${bounds.length}")
      case _ => ()
    }
    CombinationSpec.weightsOf(comb).foreach { w =>
      require(
        w.length == numSubqueries,
        s"number of weights [${w.length}] must match number of sub-queries [$numSubqueries] in hybrid query")
    }
    paginationDepth.foreach { d =>
      require(
        d >= 1 && d <= HybridLimits.MaxResultWindow,
        s"pagination_depth should be greater than 0 and less than or equal to ${HybridLimits.MaxResultWindow}")
    }
  }
}
