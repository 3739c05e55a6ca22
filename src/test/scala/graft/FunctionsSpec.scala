package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.HashEmbedder
import graft.functions.PruneUtils
import graft.functions.PruneUtils._
import graft.ingest.Chunkers

class HashEmbedderSpec extends AnyFunSuite {
  test("embed is deterministic and L2-normalized") {
    val a = HashEmbedder.embed("spark join table join", 8)
    val b = HashEmbedder.embed("spark join table join", 8)
    assert(a.toSeq == b.toSeq)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
  }
  test("embed of empty string is zero vector") {
    assert(HashEmbedder.embed("", 8).forall(_ == 0f))
  }
  test("encode weights are 1+ln(1+count)") {
    val m = HashEmbedder.encode("a b a")
    assert(math.abs(m("a") - (1.0 + math.log(3.0)).toFloat) < 1e-7)
    assert(math.abs(m("b") - (1.0 + math.log(2.0)).toFloat) < 1e-7)
  }
  test("similarity is cosine and symmetric") {
    val s1 = HashEmbedder.similarity("spark table", "table spark")
    assert(math.abs(s1 - 1.0f) < 1e-6)
    assert(HashEmbedder.similarity("a b", "c d") == HashEmbedder.similarity("c d", "a b"))
  }
}

class PruneUtilsSpec extends AnyFunSuite {
  val vec = Map("a" -> 4f, "b" -> 3f, "c" -> 2f, "d" -> 1f)

  test("top_k keeps k largest") {
    val (hi, lo) = PruneUtils.split(vec, TopK, 2f)
    assert(hi == Map("a" -> 4f, "b" -> 3f)); assert(lo == Map("c" -> 2f, "d" -> 1f))
  }
  test("top_k ties broken by token asc") {
    val (hi, _) = PruneUtils.split(Map("z" -> 2f, "y" -> 2f, "x" -> 1f), TopK, 1f)
    assert(hi == Map("y" -> 2f))
  }
  test("max_ratio keeps >= ratio*max") {
    val (hi, lo) = PruneUtils.split(vec, MaxRatio, 0.5f)
    assert(hi == Map("a" -> 4f, "b" -> 3f, "c" -> 2f)); assert(lo == Map("d" -> 1f))
  }
  test("abs_value threshold") {
    val (hi, _) = PruneUtils.split(vec, AbsValue, 3f)
    assert(hi == Map("a" -> 4f, "b" -> 3f))
  }
  test("alpha_mass: prefix mass <= alpha * total, no first-element special case") {
    // total = 10; alpha=0.5 → prefix sums 4, 7 ; 4<=5 keep a; 7>5 drop rest
    val (hi, lo) = PruneUtils.split(vec, AlphaMass, 0.5f)
    assert(hi == Map("a" -> 4f)); assert(lo.keySet == Set("b", "c", "d"))
    // alpha=0 → nothing kept (reference keeps only entries with topSum <= 0)
    val (hi0, _) = PruneUtils.split(vec, AlphaMass, 0f)
    assert(hi0.isEmpty)
    // alpha=1 → everything kept
    val (hi1, lo1) = PruneUtils.split(vec, AlphaMass, 1f)
    assert(hi1 == vec && lo1.isEmpty)
  }
  test("empty vector") {
    assert(PruneUtils.split(Map.empty[String, Float], TopK, 3f) == (Map.empty, Map.empty))
  }
}

class ChunkersSpec extends AnyFunSuite {
  test("fixed_token_length basic windows preserve original spacing") {
    val content = "one two  three four five"
    val out = Chunkers.fixedTokenLength(content, tokenLimit = 2)
    // boundaries at token starts: chunk1 = up to start of "three", etc.
    assert(out == Seq("one two  ", "three four ", "five"))
    assert(out.mkString("") == content)
  }
  test("fixed_token_length with overlap") {
    // tokenLimit=4, overlap_rate=0.5 → overlap 2, step 2
    val content = "a b c d e f"
    val out = Chunkers.fixedTokenLength(content, tokenLimit = 4, overlapRate = 0.5)
    assert(out == Seq("a b c d ", "c d e f"))
  }
  test("fixed_token_length last chunk runs to end of content") {
    val out = Chunkers.fixedTokenLength("a b c", tokenLimit = 2)
    assert(out.last.endsWith("c"))
  }
  test("fixed_token_length max_chunk_limit concatenates tail into final chunk") {
    val content = (1 to 10).map(i => s"t$i").mkString(" ")
    val out = Chunkers.fixedTokenLength(content, tokenLimit = 2, maxChunkLimit = 3)
    assert(out.size == 3)
    assert(out.mkString("") == content)
  }
  test("delimiter keeps delimiter at end of chunk") {
    val out = Chunkers.delimiter("p1\n\np2\n\np3", "\n\n")
    assert(out == Seq("p1\n\n", "p2\n\n", "p3"))
  }
  test("delimiter with trailing delimiter and no remainder") {
    val out = Chunkers.delimiter("p1\n\n", "\n\n")
    assert(out == Seq("p1\n\n"))
  }
  test("delimiter max_chunk_limit stops splitting, remainder becomes final chunk") {
    val out = Chunkers.delimiter("a.b.c.d.e", ".", maxChunkLimit = 3)
    assert(out.size == 3)
    assert(out == Seq("a.", "b.", "c.d.e"))
  }
  test("fixed_char_length windows and overlap") {
    val out = Chunkers.fixedCharLength("abcdefghij", charLimit = 4, overlapRate = 0.25)
    // overlap 1, interval 3: [0,4) [3,7) [6,10)
    assert(out == Seq("abcd", "defg", "ghij"))
  }
  test("empty and null content") {
    assert(Chunkers.fixedTokenLength("") == Seq.empty)
    assert(Chunkers.delimiter("") == Seq.empty)
    assert(Chunkers.fixedCharLength("") == Seq.empty)
  }
  test("parameter validation") {
    intercept[IllegalArgumentException](Chunkers.fixedTokenLength("x", overlapRate = 0.6))
    intercept[IllegalArgumentException](Chunkers.delimiter("x", ""))
    intercept[IllegalArgumentException](Chunkers.fixedCharLength("x", charLimit = 0))
  }
  test("property: overlap-0 chunks always rejoin to the original content") {
    val rnd = new scala.util.Random(7L)
    (1 to 60).foreach { _ =>
      val nTok = rnd.nextInt(40) + 1
      val content = (1 to nTok)
        .map(_ => "a" * (rnd.nextInt(4) + 1))
        .mkString(" " * (rnd.nextInt(2) + 1))
      val tl = rnd.nextInt(7) + 1
      val tokOut = Chunkers.fixedTokenLength(content, tokenLimit = tl)
      assert(tokOut.mkString("") == content, s"token chunks drop text for tl=$tl")
      val cl = rnd.nextInt(9) + 2
      val charOut = Chunkers.fixedCharLength(content, charLimit = cl, overlapRate = 0.0)
      assert(charOut.mkString("") == content, s"char chunks drop text for cl=$cl")
      val delimOut = Chunkers.delimiter(content, " ")
      assert(delimOut.mkString("") == content)
    }
  }
}
