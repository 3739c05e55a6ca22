package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ml.HashEmbedder

/** Text-analysis operators for large-scale training-data pipelines
  * (builder-prompt first-class ops): language ID, quality scoring, token
  * counting, document fingerprinting. All are pure column expressions /
  * codegen'd projections — embarrassingly parallel, no shuffle.
  */
object TextAnalysis {

  /** Stopword lists per language (tiny, broadcast as literals). Heuristic
    * n-gram/stopword language ID: argmax of stopword hits, tie → 'und'
    * ordering by language code asc; no hits → 'und'. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "una", "los", "las"),
    "fr" -> Seq("le", "la", "de", "et", "que", "en", "un", "une", "les", "des"),
    "de" -> Seq("der", "die", "das", "und", "zu", "in", "ein", "eine", "nicht", "ist"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "bu4"))

  private def toks(c: Column): Column = filter(split(lower(c), "\\s+"), x => x =!= "")

  /** Per-language stopword hit count columns + argmax prediction. */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = toks(col(textCol))
    val langsSorted = stopwords.keys.toSeq.sorted
    val withHits = langsSorted.foldLeft(df) { (d, lang) =>
      val wl = typedLit(stopwords(lang))
      d.withColumn(s"hits_$lang", size(filter(t, x => array_contains(wl, x))))
    }
    // argmax with deterministic tie-break: highest hits, then lang code asc
    val best = langsSorted.foldLeft((lit("und"), lit(0))) { case ((bl, bh), l) =>
      val h = col(s"hits_$l")
      (when(h > bh, lit(l)).otherwise(bl), when(h > bh, h).otherwise(bh))
    }
    withHits.withColumn("pred_lang", best._1)
  }

  /** Quality signals (length, punctuation ratio, stopword ratio, mean word
    * length, alpha ratio) + a composite [0,1] score. All ASCII-scoped —
    * divergence from ICU-based scoring documented. */
  def quality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = toks(col(textCol))
    val nTok = size(t).cast("double")
    val nChars = length(col(textCol)).cast("double")
    val allStop = typedLit(stopwords.values.flatten.toSeq.distinct)
    val stopHits = size(filter(t, x => array_contains(allStop, x))).cast("double")
    val punct = (nChars - length(regexp_replace(col(textCol), "[\\p{Punct}]", ""))).cast("double")
    df
      .withColumn("n_tokens", size(t))
      .withColumn("mean_word_len",
        when(nTok > 0, round((nChars - (nTok - 1)) / nTok, 4)).otherwise(lit(0.0)))
      .withColumn("stopword_ratio", when(nTok > 0, round(stopHits / nTok, 4)).otherwise(lit(0.0)))
      .withColumn("punct_ratio", when(nChars > 0, round(punct / nChars, 4)).otherwise(lit(0.0)))
      .withColumn("quality_score",
        round(least(lit(1.0), nTok / lit(20.0)) * (lit(1.0) - col("punct_ratio")), 4))
  }

  /** Token counting: whitespace tokens + a BPE-ish subword estimate
    * (ceil(chars/4) per word is the classic approximation). */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = toks(col(textCol))
    df
      .withColumn("n_tokens", size(t))
      .withColumn("n_subword_est",
        aggregate(t, lit(0L), (acc, x) => acc + ceil(length(x).cast("double") / 4.0).cast("long")))
  }

  /** Rolling polynomial hash (Rabin-Karp, base 31, mod 2^61-1) over tokens —
    * order-sensitive document fingerprint; pure Scala, deterministic. */
  def rollingHash(tokens: Seq[String]): Long = {
    val MOD = (1L << 61) - 1
    var h = 0L
    tokens.foreach { t =>
      val th = HashEmbedder.tokenHash(t).toLong & 0xffffffffL
      h = (mulMod(h, 31L, MOD) + th) % MOD
    }
    h
  }
  /** (a*b) mod (2^61-1) without allocation — the BigInteger form burned
    * three objects per TOKEN inside the corpus-wide fingerprint UDF. The
    * 128-bit product is (hi, lo) via Math.multiplyHigh; with the Mersenne
    * modulus 2^61 ≡ 1, fold v = q·2^61 + r ≡ q + r twice. Equality with the
    * BigInteger form is property-tested. */
  private[graft] def mulMod(a: Long, b: Long, m: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // q = floor(v / 2^61) = (hi << 3) | (lo >>> 61); r = (lo mod 2^61) + q
    var r = (lo & m) + ((hi << 3) | (lo >>> 61))
    while (r >= m) r -= m // at most twice for our ranges; r == m reduces to 0
    r
  }

  private val rollingHashUdf = udf((s: String) => rollingHash(HashEmbedder.tokenize(s).toSeq))

  /** Fingerprints: order-sensitive rolling hash + content md5. */
  def fingerprint(df: DataFrame, textCol: String = "text"): DataFrame =
    df
      .withColumn("fp_rolling", rollingHashUdf(col(textCol)))
      .withColumn("fp_md5", md5(col(textCol)))

  /** Repetition quality signals (the Gopher-rules family): fraction of
    * tokens taken by the most common unigram, fraction of bigram positions
    * taken by the most common bigram, and the fraction of trigram positions
    * covered by ANY repeated trigram. High values flag machine-generated /
    * boilerplate text that simple length/stopword ratios miss. Row-local
    * single-pass kernel (one HashMap per doc per gram order) — no shuffle,
    * embarrassingly parallel like the rest of this module; all three
    * fractions are integer ratios so the oracle divides the same ints. */
  private val repetitionUdf = udf((s: String) => {
    val t = HashEmbedder.tokenize(s)
    def gramStats(order: Int): (Int, Int, Int) = { // (total, maxCount, dupPositions)
      val total = math.max(t.length - order + 1, 0)
      if (total == 0) (0, 0, 0)
      else {
        val m = scala.collection.mutable.HashMap.empty[String, Int]
        var i = 0
        while (i < total) {
          val g = if (order == 1) t(i) else t.slice(i, i + order).mkString(" ")
          m.update(g, m.getOrElse(g, 0) + 1)
          i += 1
        }
        var mx = 0; var dup = 0
        m.valuesIterator.foreach { c => if (c > mx) mx = c; if (c > 1) dup += c }
        (total, mx, dup)
      }
    }
    val (n1, m1, _) = gramStats(1)
    val (n2, m2, _) = gramStats(2)
    val (n3, _, d3) = gramStats(3)
    (if (n1 == 0) 0.0 else m1.toDouble / n1,
      if (n2 == 0) 0.0 else m2.toDouble / n2,
      if (n3 == 0) 0.0 else d3.toDouble / n3)
  })

  def repetition(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), repetitionUdf(col(textCol)).as("r"))
      .select(col(idCol),
        round(col("r._1"), 6).as("top_unigram_frac"),
        round(col("r._2"), 6).as("top_bigram_frac"),
        round(col("r._3"), 6).as("dup_trigram_frac"))

  /** Corpus vocabulary extraction: token -> (total count, document
    * frequency), top-K by count with token-asc tie-break. The frequency
    * table that feeds BPE-training prep and data-driven stopword lists.
    * One explode + one aggregation: partial (map-side) aggregation does
    * the heavy lifting, the shuffle carries one row per distinct
    * (token, doc) for df and per token for counts — at 100 TB the result
    * is vocabulary-sized, not corpus-sized. */
  def vocab(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      topK: Int = 100): DataFrame = {
    val exploded = df.select(col(idCol).as("__id"), explode(toks(col(textCol))).as("token"))
    val out = exploded.groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"), count_distinct(col("__id")).as("df"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(topK)
    out
  }

  /** Corpus-relative token commonness: per doc, the mean corpus frequency
    * of its tokens — sum over the doc of count(token), divided once by
    * n_doc_tokens · total_corpus_tokens. The rational-arithmetic cousin of
    * perplexity filtering: rare-token-heavy (OOV-ish, noisy) docs score
    * low, boilerplate scores high, and because the score is ONE division
    * of exact integer sums there is no ln()/float-fold surface to
    * diverge cross-engine (a true unigram-LM perplexity needs ln, whose
    * last-ulp behavior is libm-specific — considered and rejected for the
    * hard gate). Two shuffles: the corpus count aggregation
    * (vocabulary-sized, broadcast back) and the per-doc sum of exact
    * longs (order-independent). */
  def commonness(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toksOf = toks(col(textCol))
    val exploded = df.select(col(idCol).as("__id"), explode(toksOf).as("token"))
    val counts = exploded.groupBy(col("token")).agg(count(lit(1)).as("__c"))
    val totalRow = counts.agg(sum(col("__c")).as("__t"))
    exploded
      .join(broadcast(counts), "token")
      .groupBy(col("__id"))
      .agg(sum(col("__c")).as("__sc"), count(lit(1)).as("__n"))
      .crossJoin(broadcast(totalRow))
      .select(col("__id").as(idCol),
        col("__n").cast("int").as("n_tokens"),
        round(col("__sc").cast("double") /
          (col("__n").cast("double") * col("__t").cast("double")), 8)
          .as("mean_token_freq"))
  }

  /** Per-stratum corpus profile: row count, exact mean and interpolated
    * p50/p95 of a numeric column — the summary a pipeline owner reads
    * before choosing filter thresholds. Means divide an EXACT integer sum
    * (no float-order sensitivity); percentiles use the standard
    * (n-1)p linear interpolation both engines implement. One shuffle,
    * stratum-sized output. */
  def corpusStats(df: DataFrame, strataCol: String = "source",
      numCol: String = "n_chars"): DataFrame =
    df.groupBy(col(strataCol))
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum(col(numCol)).cast("double") / count(lit(1)), 4).as("mean_chars"),
        // exact interpolating percentile (NOT percentile_approx, which
        // returns a dataset element) — matches quantile_cont's (n-1)p rule
        round(expr(s"percentile($numCol, 0.5d)"), 4).as("p50_chars"),
        round(expr(s"percentile($numCol, 0.95d)"), 4).as("p95_chars"))

  /** Gopher-style corpus filter: compose the length / word-shape /
    * repetition signals into a keep-or-drop decision with a per-document
    * REJECT REASON (the first failing rule, in a fixed order — the
    * breakdown a pipeline owner actually reads). One row-local projection
    * (signals recomputed inline, NOT joined from the signal operators — a
    * join on doc_id would shuffle the corpus for values the scan can
    * compute in place); thresholds compare ROUNDED signal values, so the
    * oracle compares the identical doubles. Returns
    * (doc_id, kept, reason). */
  def gopherFilter(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      minTokens: Int = 20, maxTokens: Int = 90, maxMeanWordLen: Double = 5.0,
      maxTopUnigram: Double = 0.12, maxTopBigram: Double = 0.08,
      maxDupTrigram: Double = 0.05): DataFrame = {
    val t = toks(col(textCol))
    val nTok = size(t)
    val nTokD = nTok.cast("double")
    val nChars = length(col(textCol)).cast("double")
    val meanWl = when(nTok > 0, round((nChars - (nTokD - 1)) / nTokD, 4)).otherwise(lit(0.0))
    df.select(col(idCol), nTok.as("n_tokens"), meanWl.as("mean_word_len"),
        repetitionUdf(col(textCol)).as("r"))
      .select(col(idCol), col("n_tokens"), col("mean_word_len"),
        round(col("r._1"), 6).as("top_unigram_frac"),
        round(col("r._2"), 6).as("top_bigram_frac"),
        round(col("r._3"), 6).as("dup_trigram_frac"))
      .withColumn("reason",
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("n_tokens") > maxTokens, "too_long")
          .when(col("mean_word_len") > maxMeanWordLen, "word_len")
          .when(col("top_unigram_frac") > maxTopUnigram, "repetitive_unigram")
          .when(col("top_bigram_frac") > maxTopBigram, "repetitive_bigram")
          .when(col("dup_trigram_frac") > maxDupTrigram, "repetitive_trigram")
          .otherwise("ok"))
      .select(col(idCol), (col("reason") === "ok").as("kept"), col("reason"))
  }
}
