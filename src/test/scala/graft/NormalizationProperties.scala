package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.exec.{Combination, Normalization}
import graft.model._

/** Property tests: the Spark normalization/combination pipeline vs direct
  * Scala transcriptions of the reference's float arithmetic
  * (MinMaxScoreNormalizationTechnique.normalizeSingleScore,
  * ZScoreNormalizationTechnique.normalizeSingleScore,
  * {Arithmetic,Geometric,Harmonic,RRF}ScoreCombinationTechnique.combine).
  * Fixed-data oracles can't catch drift on inputs they never see; seeded
  * fuzzing over random score sets can. Tolerance 1e-6 covers the
  * float-vs-double evaluation difference (the reference computes in float,
  * the engine in double).
  */
class NormalizationProperties extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260812L)

  // ---- direct transcriptions (reference float arithmetic) ----------------

  private def refMinMax(scores: Array[Float]): Array[Float] = {
    val mn = scores.min; val mx = scores.max
    scores.map { s =>
      if (mx.compare(mn) == 0 && mx.compare(s) == 0) 1.0f
      else if ((mx - mn).compare(0.0f) == 0) 1.0f
      else {
        val n = (s - mn) / (mx - mn)
        if (n == 0.0f) 0.001f else n
      }
    }
  }

  private def refZScore(scores: Array[Float]): Array[Float] = {
    // commons-math DescriptiveStatistics: double accumulation, float cast
    val n = scores.length
    val mean = (scores.map(_.toDouble).sum / n).toFloat
    val sd =
      if (n < 2) 0.0f
      else math.sqrt(scores.map(s => (s - mean).toDouble * (s - mean)).sum / (n - 1)).toFloat
    val mx = scores.max; val mn = scores.min
    scores.map { s =>
      if (mean.compare(s) == 0) mx
      else if (sd.compare(0.0f) == 0) mn
      else {
        val z = (s - mean) / sd
        if (z <= 0.0f) 0.001f else z
      }
    }
  }

  private def refCombine(comb: String, scores: Array[Float], ws: Array[Float]): Float =
    comb match {
      case "arithmetic_mean" =>
        var cs = 0.0f; var sw = 0.0f
        scores.indices.foreach { i =>
          if (scores(i) >= 0.0f) { cs += scores(i) * ws(i); sw += ws(i) }
        }
        if (sw == 0.0f) 0.0f else cs / sw
      case "geometric_mean" =>
        var ln = 0.0f; var sw = 0.0f
        scores.indices.foreach { i =>
          if (scores(i) > 0.0f) { sw += ws(i); ln += (ws(i) * math.log(scores(i))).toFloat }
        }
        if (sw == 0.0f) 0.0f else math.exp((ln / sw).toDouble).toFloat
      case "harmonic_mean" =>
        var sw = 0.0f; var sh = 0.0f
        scores.indices.foreach { i =>
          if (scores(i) > 0.0f) { sw += ws(i); sh += ws(i) / scores(i) }
        }
        if (sh > 0.0f) sw / sh else 0.0f
      case "rrf" =>
        var cs = 0.0f; var sw = 0.0f
        scores.indices.foreach { i =>
          if (scores(i) >= 0.0f) { cs += scores(i) * ws(i); sw += ws(i) }
        }
        if (sw == 0.0f) 0.0f else cs
    }

  // ---- helpers -----------------------------------------------------------

  private def runNorm(scores: Array[Float], spec: NormalizationSpec): Map[Long, Double] = {
    val rel = scores.zipWithIndex
      .map { case (s, i) => (0L, 0, i.toLong, s.toDouble) }.toSeq
      .toDF("query_id", "subq", "doc_id", "score")
    Normalization.normalize(rel, spec).collect()
      .map(r => r.getLong(2) -> r.getDouble(3)).toMap
  }

  private def randScores(n: Int): Array[Float] =
    Array.fill(n)(rnd.nextInt(4) match {
      case 0 => rnd.nextFloat() * 10f
      case 1 => rnd.nextFloat() // small
      case 2 => (rnd.nextInt(5) + 1).toFloat // integer ties likely
      case _ => rnd.nextFloat() * 0.01f
    })

  test("min_max matches the reference float transcription on 60 random sets") {
    (1 to 60).foreach { _ =>
      val scores = randScores(rnd.nextInt(8) + 1)
      val exp = refMinMax(scores)
      val got = runNorm(scores, NormalizationSpec.MinMax())
      scores.indices.foreach { i =>
        assert(math.abs(got(i.toLong) - exp(i)) < 1e-6,
          s"min_max mismatch at $i for ${scores.toSeq}: got ${got(i.toLong)}, exp ${exp(i)}")
      }
    }
  }

  test("z_score float-mean edge: score equals the FLOAT mean but not the double mean") {
    // double mean of {0.1f, 0.2f, 0.15f} != 0.15f as double, but the float
    // cast of the mean equals 0.15f — the reference takes the max branch
    val scores = Array(0.1f, 0.2f, 0.15f)
    val exp = refZScore(scores)
    assert(exp(2) == 0.2f, "transcription itself must take the max branch")
    val got = runNorm(scores, NormalizationSpec.ZScore)
    scores.indices.foreach { i =>
      assert(math.abs(got(i.toLong) - exp(i)) < 2e-5,
        s"mismatch at $i: got ${got(i.toLong)}, exp ${exp(i)}")
    }
  }

  test("z_score matches the reference float transcription on 60 random sets") {
    (1 to 60).foreach { _ =>
      val scores = randScores(rnd.nextInt(8) + 1)
      val exp = refZScore(scores)
      val got = runNorm(scores, NormalizationSpec.ZScore)
      scores.indices.foreach { i =>
        assert(math.abs(got(i.toLong) - exp(i)) < 2e-5,
          s"z_score mismatch at $i for ${scores.toSeq}: got ${got(i.toLong)}, exp ${exp(i)}")
      }
    }
  }

  test("combinations match the reference float transcription incl. absent subqueries") {
    val specs: Seq[(String, Option[Seq[Double]] => CombinationSpec)] = Seq(
      ("arithmetic_mean", w => CombinationSpec.ArithmeticMean(w)),
      ("geometric_mean", w => CombinationSpec.GeometricMean(w)),
      ("harmonic_mean", w => CombinationSpec.HarmonicMean(w)),
      ("rrf", w => CombinationSpec.RRF(w)))
    (1 to 40).foreach { _ =>
      val nSub = rnd.nextInt(4) + 2
      val weights = Array.fill(nSub)(rnd.nextFloat() + 0.1f)
      // each subquery present with p=0.7; absent = missing row (reference: score < 0 skip)
      val present = Array.fill(nSub)(rnd.nextDouble() < 0.7)
      if (present.exists(identity)) {
        val scores = Array.fill(nSub)(rnd.nextFloat() * 2f)
        val rows = (0 until nSub).filter(present)
          .map(i => (0L, i, 42L, scores(i).toDouble))
        val refScores = (0 until nSub)
          .map(i => if (present(i)) scores(i) else -1.0f).toArray
        specs.foreach { case (name, mk) =>
          val df = rows.toDF("query_id", "subq", "doc_id", "score")
          val got = Combination.combine(df, mk(Some(weights.map(_.toDouble).toSeq)))
            .collect()(0).getAs[Double]("score")
          val exp = refCombine(name, refScores, weights)
          assert(math.abs(got - exp) < 2e-6,
            s"$name mismatch for scores=${refScores.toSeq} w=${weights.toSeq}: got $got, exp $exp")
        }
      }
    }
  }
}
