package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SmallFloatNorm._

class SmallFloatNormSpec extends AnyFunSuite {

  test("free-value range is exact (published constant: 24 free values)") {
    assert(NumFreeValues == 24)
    (0 until NumFreeValues).foreach(i => assert(quantize(i) == i))
  }

  test("quantize truncates: result is the largest decodable <= input") {
    val decodable = decodedValues.distinct.sorted
    (0 to 5000).foreach { i =>
      val expect = decodable.takeWhile(_ <= i).last
      assert(quantize(i) == expect, s"at $i")
    }
  }

  test("monotone, idempotent on decodables, never exceeds the input") {
    var prev = -1
    (0 to 100000 by 7).foreach { i =>
      val q = quantize(i)
      assert(q <= i)
      assert(q >= prev); prev = q
    }
    decodedValues.foreach(v => assert(quantize(v) == v))
  }

  test("4-mantissa-bit coarseness: buckets double every 8 steps past the free range") {
    // representable gaps: 36..44 share nothing (gap 4 at shift 2): 61 -> 60
    assert(quantize(61) == 60)
    assert(quantize(255) == 248)
    // byte codes are dense: 256 distinct decodables, ascending
    assert(decodedValues.distinct.size == 256)
    assert(decodedValues == decodedValues.sorted)
  }
}
