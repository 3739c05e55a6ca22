package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PruneUtils
import graft.ml.HashEmbedder

/** Seeded randomized property tests (plain generators — the offline cache
  * has no scalatest-scalacheck bridge). 200 cases per property, seed 42. */
class PruneProperties extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)
  private def randVec(): Map[String, Float] =
    (0 until rnd.nextInt(12)).map(i => s"t${rnd.nextInt(20)}" -> (0.01f + rnd.nextFloat() * 10f)).toMap
  private val types = Seq(PruneUtils.TopK, PruneUtils.MaxRatio, PruneUtils.AbsValue, PruneUtils.AlphaMass)

  test("split partitions the vector exactly (kept ∪ pruned == original, disjoint)") {
    (1 to 200).foreach { _ =>
      val vec = randVec(); val t = types(rnd.nextInt(types.size))
      val ratio = t match {
        case PruneUtils.TopK => (rnd.nextInt(10) + 1).toFloat
        case PruneUtils.AbsValue => rnd.nextFloat() * 10
        case _ => rnd.nextFloat()
      }
      val (hi, lo) = PruneUtils.split(vec, t, ratio)
      assert(hi ++ lo == vec)
      assert(hi.keySet.intersect(lo.keySet).isEmpty)
    }
  }

  test("top_k keeps at most k entries, all >= every pruned entry") {
    (1 to 200).foreach { _ =>
      val vec = randVec(); val k = rnd.nextInt(10) + 1
      val (hi, lo) = PruneUtils.split(vec, PruneUtils.TopK, k.toFloat)
      assert(hi.size <= k)
      if (hi.nonEmpty && lo.nonEmpty) assert(hi.values.min >= lo.values.max)
    }
  }

  test("max_ratio: every kept weight >= ratio * max") {
    (1 to 200).foreach { _ =>
      val vec = randVec(); val r = rnd.nextFloat() * 0.99f
      if (vec.nonEmpty) {
        val (hi, _) = PruneUtils.split(vec, PruneUtils.MaxRatio, r)
        val mx = vec.values.max
        assert(hi.values.forall(_ >= r * mx))
      }
    }
  }

  test("alpha_mass mass bound: kept mass <= alpha * total (within float slack)") {
    (1 to 200).foreach { _ =>
      val vec = randVec(); val a = 0.1f + rnd.nextFloat() * 0.9f
      if (vec.nonEmpty) {
        val (hi, _) = PruneUtils.split(vec, PruneUtils.AlphaMass, a)
        val total = vec.values.map(_.toDouble).sum
        val kept = hi.values.map(_.toDouble).sum
        assert(kept <= a * total + 1e-3 * total)
      }
    }
  }
}

class EmbedderProperties extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)
  private val words = Seq("spark", "join", "table", "scan", "agg", "fast", "slow", "row")
  private def randText(): String =
    (0 until rnd.nextInt(15)).map(_ => words(rnd.nextInt(words.size))).mkString(" ")

  test("embed is unit-norm or zero") {
    (1 to 200).foreach { _ =>
      val v = HashEmbedder.embed(randText(), 8)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5 || n == 0.0)
    }
  }

  test("similarity is bounded and reflexive") {
    (1 to 100).foreach { _ =>
      val s = randText()
      if (s.trim.nonEmpty) {
        assert(math.abs(HashEmbedder.similarity(s, s) - 1.0f) < 1e-5)
        val sim = HashEmbedder.similarity(s, randText())
        assert(sim >= -1.0001f && sim <= 1.0001f)
      }
    }
  }

  test("encode weights are monotone in token count") {
    (1 to 100).foreach { _ =>
      val a = rnd.nextInt(20) + 1; val b = rnd.nextInt(20) + 1
      val wa = HashEmbedder.encode(Seq.fill(a)("x").mkString(" "))("x")
      val wb = HashEmbedder.encode(Seq.fill(b)("x").mkString(" "))("x")
      assert((a < b) == (wa < wb) || a == b)
    }
  }
}

class BoundsSpec extends SparkSpec {
  import spark.implicits._
  import graft.model._
  import graft.exec.Normalization

  private def rel(rows: (Long, Int, Long, Double)*) =
    rows.toDF("query_id", "subq", "doc_id", "score")

  private def out(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap

  // scores: 2, 5, 8 → min 2, max 8
  private val base = rel((0, 0, 1, 2.0), (0, 0, 2, 5.0), (0, 0, 3, 8.0))

  test("lower bound APPLY: effective min becomes bound for scores above it") {
    val b = Seq((ScoreBound(enabled = true, BoundMode.Apply, 4.0f), ScoreBound.disabledUpper))
    val m = out(Normalization.minMax(base, b))
    // doc1 (2 < bound) → uses real min: (2-2)/(8-2)=0 → floor 0.001
    assert(m(1L) == 0.001)
    // doc2 (5 > bound, max > bound) → (5-4)/(8-4) = 0.25
    assert(math.abs(m(2L) - 0.25) < 1e-9)
    assert(math.abs(m(3L) - 1.0) < 1e-9)
  }

  test("lower bound CLIP: scores below bound clamp to MIN_SCORE") {
    val b = Seq((ScoreBound(enabled = true, BoundMode.Clip, 4.0f), ScoreBound.disabledUpper))
    val m = out(Normalization.minMax(base, b))
    assert(m(1L) == 0.001) // clipped
    assert(math.abs(m(2L) - 0.25) < 1e-9) // (5-4)/(8-4)
  }

  test("upper bound CLIP: scores above bound clamp to 1.0") {
    val b = Seq((ScoreBound.disabledLower, ScoreBound(enabled = true, BoundMode.Clip, 6.0f)))
    val m = out(Normalization.minMax(base, b))
    assert(m(3L) == 1.0) // 8 > 6 → clipped to max
    assert(math.abs(m(2L) - (5.0 - 2.0) / (6.0 - 2.0)) < 1e-9)
  }

  test("IGNORE mode = no bounds") {
    val b = Seq((ScoreBound(enabled = true, BoundMode.Ignore, 4.0f),
      ScoreBound(enabled = true, BoundMode.Ignore, 6.0f)))
    val withB = out(Normalization.minMax(base, b))
    val withoutB = out(Normalization.minMax(base))
    assert(withB == withoutB)
  }

  test("bounds apply only to their subquery index") {
    val two = rel((0, 0, 1, 2.0), (0, 0, 2, 8.0), (0, 1, 1, 2.0), (0, 1, 2, 8.0))
    val b = Seq(
      (ScoreBound(enabled = true, BoundMode.Clip, 4.0f), ScoreBound.disabledUpper),
      (ScoreBound.disabledLower, ScoreBound.disabledUpper))
    val rows = Normalization.minMax(two, b).collect()
      .map(r => (r.getInt(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(rows((0, 1L)) == 0.001) // clipped in subquery 0
    assert(rows((1, 1L)) == 0.001) // subquery 1: (2-2)/(8-2)=0 → floor (not clip)
    assert(rows((0, 2L)) == 1.0 && rows((1, 2L)) == 1.0)
  }
}
