package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical subquery scoring for hybrid queries (the `match`/`term`/`range`
  * sub-kinds in the reference's hybrid fixtures). OpenSearch scores `match`
  * with Lucene BM25; we pin OUR deterministic scorer (documented divergence,
  * SURVEY §7.3): tf × idf with the BM25 idf form
  *     idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))
  * summed over query terms. Document frequencies come from a corpus-wide
  * aggregation restricted to the query terms — at scale a broadcast join of
  * a |terms|-row table, with the term filter pushed into the token explode.
  */
object Lexical {

  // The NATIVE-column form of HashEmbedder.tokenize (lower → split \s+ →
  // drop empties): one tokenizer semantics engine-wide, two physical forms
  // (codegen'd expression here for the hot exploded path, Scala function
  // where a UDF already owns the row). Equivalence is pinned by a property
  // test (Round3Spec "native tokenizer ≡ HashEmbedder.tokenize") — if
  // either side changes, that test fails before the oracles drift.
  private def toks(c: Column): Column = filter(split(lower(c), "\\s+"), x => x =!= "")

  /** (doc_id, score) for docs matching ≥1 term. */
  def matchScore(docs: DataFrame, terms: Seq[String], textCol: String = "text",
      docId: String = "doc_id", roundTo: Int = 6): DataFrame = {
    val termLit = typedLit(terms.distinct)
    val exploded = docs
      .select(col(docId).as("doc_id"), explode(toks(col(textCol))).as("token"))
      .where(array_contains(termLit, col("token")))
    val tf = exploded.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("N"))
    tf
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(n))
      .withColumn("idf", log(lit(1.0) + (col("N") - col("df") + 0.5) / (col("df") + 0.5)))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("tf") * col("idf")), roundTo).as("score"))
      .where(col("score") > 0.0)
  }

  /** Lucene `standard`-analyzer tokens as a native column: lowercase, then
    * EXTRACT maximal UAX#29-style words instead of splitting on non-
    * alphanumerics. The pattern realizes the word-break joins Lucene's
    * StandardTokenizer applies (same rules, by clause):
    *   - WB6/WB7: letters joined across ONE apostrophe (' or ’, the
    *     MidNumLetQ set) or full stop (MidNumLet) — "don't" → don't,
    *     "u.s.a." → u.s.a (trailing dot never joins: no letter follows);
    *   - WB11/WB12: digits joined across one [.,'’] (MidNum ∪ MidNumLetQ)
    *     — "3.14" / "1,000" stay whole;
    *   - WB9/WB10: letter and digit runs concatenate directly (abc123);
    *   - WB13a/WB13b: underscore (ExtendNumLet) glues runs and may lead or
    *     trail — "foo_bar", "baz_";
    * an all-separator match ("___") carries no letter/digit and is dropped
    * by the filter, as Lucene emits nothing for it. Flank classes are
    * enforced by construction: each join lives inside the alternate whose
    * run class UAX#29 requires on both sides, so "1.a" and "a,1" split.
    * The regex is RE2-safe (no lookaround) — the DuckDB oracle runs the
    * SAME pattern via regexp_extract_all (q_lexical_bm25). */
  private[graft] val StandardTokenPattern =
    """(?:_+|\p{L}+(?:['’.]\p{L}+)*|\p{N}+(?:[.,'’]\p{N}+)*)+"""
  private[graft] def standardToks(c: Column): Column =
    filter(regexp_extract_all(lower(c), lit(StandardTokenPattern), lit(0)),
      x => x.rlike("[\\p{L}\\p{N}]"))

  /** Lucene-parity BM25 `match` scoring (BM25Similarity):
    *
    *     idf(t)  = ln(1 + (N − df + 0.5)/(df + 0.5))
    *     norm(d) = k1 · (1 − b + b · dl/avgdl)
    *     score   = Σ_t idf(t) · tf/(tf + norm(d))
    *
    * over standard-analyzer tokens — the reference defers `match` scoring
    * to OpenSearch/Lucene core (e.g. query/HybridQueryBuilder.java:56-461
    * wraps arbitrary Lucene queries); this is that scorer's published form.
    * Doc-length granularity is a switch: the default scores with the EXACT
    * token count (finer-grained than a real cluster); `luceneNorms = true`
    * reproduces Lucene's lossy SmallFloat norm byte
    * (functions/SmallFloatNorm) — the decoded quantized length feeds the
    * norm while avgdl stays the exact corpus stat, exactly like
    * BM25Similarity's per-byte cache. Both variants are oracled
    * (q_lexical_bm25, q_lexical_bm25_norms).
    *
    * Scale shape: tf explodes only tokens matching the |terms|-literal
    * filter (pushed into the explode); df and the (N, avgdl) scalars are
    * broadcast; dl is a per-row array size — no corpus-keyed shuffle except
    * the (doc, token) tf groupBy, which is bounded by matching tokens. */
  private val quantizeDlUdf =
    udf((n: Int) => graft.functions.SmallFloatNorm.quantize(n).toDouble)

  def bm25Score(docs: DataFrame, terms: Seq[String], textCol: String = "text",
      docId: String = "doc_id", k1: Double = 1.2, b: Double = 0.75,
      roundTo: Int = 6, luceneNorms: Boolean = false): DataFrame = {
    val termLit = typedLit(terms.distinct)
    // luceneNorms: score with the lossy SmallFloat norm byte exactly as
    // BM25Similarity's per-byte cache does — dl is the decoded quantized
    // length, while avgdl stays the EXACT sum/count (Lucene's
    // avgFieldLength comes from exact corpus stats, not the norm bytes)
    val dlExpr =
      if (luceneNorms) quantizeDlUdf(size(col("__toks")))
      else size(col("__toks")).cast("double")
    val withDl = docs.select(col(docId).as("doc_id"),
      standardToks(col(textCol)).as("__toks"))
      .select(col("doc_id"), col("__toks"), dlExpr.as("dl"),
        size(col("__toks")).cast("double").as("__dlExact"))
    val stats = withDl.select(count(lit(1)).as("N"), avg(col("__dlExact")).as("avgdl"))
    val tf = withDl
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("token"))
      .where(array_contains(termLit, col("token")))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) + (col("N") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("tfn", col("tf") /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("idf") * col("tfn")), roundTo).as("score"))
      .where(col("score") > 0.0)
  }

  /** `term` query: exact keyword equality — constant score 1.0 filter. */
  def termScore(docs: DataFrame, field: String, value: String,
      docId: String = "doc_id"): DataFrame =
    docs.where(col(field) === value).select(col(docId).as("doc_id"), lit(1.0).as("score"))

  /** `range` query: numeric/temporal bounds — constant score 1.0 filter. */
  def rangeScore(docs: DataFrame, field: String, gte: Option[Any], lt: Option[Any],
      docId: String = "doc_id"): DataFrame = {
    val base = (gte, lt) match {
      case (Some(a), Some(b)) => docs.where(col(field) >= a && col(field) < b)
      case (Some(a), None)    => docs.where(col(field) >= a)
      case (None, Some(b))    => docs.where(col(field) < b)
      case (None, None)       => docs
    }
    base.select(col(docId).as("doc_id"), lit(1.0).as("score"))
  }
}
