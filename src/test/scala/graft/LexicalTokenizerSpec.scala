package graft

import org.apache.spark.sql.functions._
import graft.exec.Lexical

/** Parity fixture for the UAX#29 standard tokenizer (Lexical.standardToks)
  * against transcribed Lucene StandardTokenizer output: contractions
  * (WB6/WB7 apostrophe joins), acronym dots (MidNumLet), numeric grouping
  * (WB11/WB12), letter↔digit adjacency (WB9/WB10), underscore glue
  * (WB13a/WB13b), and the splits the joins must NOT imply (hyphen,
  * mixed-class flanks, trailing dots). The DuckDB oracle for q_lexical_bm25
  * runs the same regex via regexp_extract_all, so this fixture also pins
  * the Spark↔oracle tokenizer equivalence.
  */
class LexicalTokenizerSpec extends SparkSpec {

  private val fixture: Seq[(String, Seq[String])] = Seq(
    "Don't stop"                     -> Seq("don't", "stop"),
    "O'Neill's"                      -> Seq("o'neill's"),
    "U.S.A. approved"                -> Seq("u.s.a", "approved"),
    "The 3.14 value and 1,000 items" -> Seq("the", "3.14", "value", "and", "1,000", "items"),
    "wi-fi"                          -> Seq("wi", "fi"),
    "foo_bar baz_"                   -> Seq("foo_bar", "baz_"),
    "abc123def"                      -> Seq("abc123def"),
    "1.a 2,b"                        -> Seq("1", "a", "2", "b"),
    "can’t"                     -> Seq("can’t"),
    "x... y"                         -> Seq("x", "y"),
    "e.g. example"                   -> Seq("e.g", "example"),
    "'quoted'"                       -> Seq("quoted"),
    "___"                            -> Seq.empty,
    ""                               -> Seq.empty)

  test("standardToks matches the transcribed Lucene StandardTokenizer fixture") {
    val s = spark
    import s.implicits._
    val got = fixture.map(_._1).toDF("text")
      .select(Lexical.standardToks(col("text")).as("toks"))
      .collect().map(_.getSeq[String](0).toList)
    fixture.zip(got).foreach { case ((text, exp), actual) =>
      assert(actual == exp.toList, s"for input '$text'")
    }
  }

  test("bm25 scoring stays consistent with the new tokenizer dl") {
    val s = spark
    import s.implicits._
    // "don't" must count as ONE token for dl; "u.s.a" must match as a
    // whole (a query for "u" must NOT hit the acronym)
    val docs = Seq((0L, "don't panic ever"), (1L, "u.s.a shipping rules"))
      .toDF("doc_id", "text")
    val hitWhole = Lexical.bm25Score(docs, Seq("u.s.a")).collect()
    assert(hitWhole.map(_.getLong(0)).toSet == Set(1L))
    val hitPart = Lexical.bm25Score(docs, Seq("u")).collect()
    assert(hitPart.isEmpty)
    val contraction = Lexical.bm25Score(docs, Seq("don't")).collect()
    assert(contraction.map(_.getLong(0)).toSet == Set(0L))
  }
}
