package graft.ingest

import scala.collection.mutable.ArrayBuffer

/** Text chunking algorithms, parameter-for-parameter from the reference's
  * `processor/chunker` package:
  *   - fixed_token_length (FixedTokenLengthChunker.java:119-170): window of
  *     `token_limit` tokens with `overlap_rate` carry-over; chunk boundaries
  *     are character offsets of token starts so inter-token whitespace is
  *     preserved exactly; first chunk starts at 0; last chunk runs to end.
  *   - delimiter (DelimiterChunker.java:66-97): split keeping the delimiter
  *     at the END of each chunk; trailing remainder becomes the final chunk.
  *   - fixed_char_length (FixedCharLengthChunker.java:84-120): fixed char
  *     windows with overlap.
  * Shared `max_chunk_limit` semantics (Chunker.java:67-69): when
  * `chunks_so_far + chunk_string_count >= max_chunk_limit`, the ENTIRE
  * remaining content is appended as one final chunk (token/char algorithms)
  * or splitting simply stops (delimiter). -1 disables the limit.
  *
  * Tokenizer divergence (documented): the reference tokenizes via a Lucene
  * analyzer (default "standard"); we tokenize with a \S+ regex over the raw
  * string. Offset-based reconstruction semantics are identical.
  */
object Chunkers extends Serializable {

  val DefaultTokenLimit = 384
  val DefaultOverlapRate = 0.0
  val DefaultCharLimit = 2048
  val DefaultDelimiter = "\n\n"
  val DefaultMaxChunkLimit = 100
  val DisabledMaxChunkLimit: Int = -1

  private case class Tok(start: Int, end: Int)

  private def tokenizeWithOffsets(s: String): IndexedSeq[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < n) {
        val st = i
        while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
        out += Tok(st, i)
      }
    }
    out.toIndexedSeq
  }

  private def limitHit(size: Int, maxChunkLimit: Int, chunkStringCount: Int): Boolean =
    maxChunkLimit != DisabledMaxChunkLimit && size + chunkStringCount >= maxChunkLimit

  def fixedTokenLength(
      content: String,
      tokenLimit: Int = DefaultTokenLimit,
      overlapRate: Double = DefaultOverlapRate,
      maxChunkLimit: Int = DefaultMaxChunkLimit,
      chunkStringCount: Int = 1): Seq[String] = {
    require(tokenLimit > 0, "token_limit must be positive")
    require(overlapRate >= 0.0 && overlapRate <= 0.5, "overlap_rate must be within [0, 0.5]")
    if (content == null) return Seq.empty
    val tokens = tokenizeWithOffsets(content)
    val out = ArrayBuffer.empty[String]
    val overlapTokens = math.floor(tokenLimit * overlapRate).toInt
    var startTokenIndex = 0
    var done = false
    while (!done && startTokenIndex < tokens.size) {
      val startPos = if (startTokenIndex == 0) 0 else tokens(startTokenIndex).start
      if (limitHit(out.size, maxChunkLimit, chunkStringCount)) {
        out += content.substring(startPos); done = true
      } else if (startTokenIndex + tokenLimit >= tokens.size) {
        out += content.substring(startPos, content.length); done = true
      } else {
        out += content.substring(startPos, tokens(startTokenIndex + tokenLimit).start)
        startTokenIndex += tokenLimit - overlapTokens
      }
    }
    out.toSeq
  }

  def delimiter(
      content: String,
      delimiter: String = DefaultDelimiter,
      maxChunkLimit: Int = DefaultMaxChunkLimit,
      chunkStringCount: Int = 1): Seq[String] = {
    require(delimiter != null && delimiter.nonEmpty, "delimiter must be a non-empty string")
    if (content == null) return Seq.empty
    val out = ArrayBuffer.empty[String]
    var start = 0
    var next = content.indexOf(delimiter)
    var stopped = false
    while (next != -1 && !stopped) {
      if (limitHit(out.size, maxChunkLimit, chunkStringCount)) stopped = true
      else {
        val end = next + delimiter.length
        out += content.substring(start, end)
        start = end
        next = content.indexOf(delimiter, start)
      }
    }
    if (start < content.length) out += content.substring(start)
    out.toSeq
  }

  def fixedCharLength(
      content: String,
      charLimit: Int = DefaultCharLimit,
      overlapRate: Double = DefaultOverlapRate,
      maxChunkLimit: Int = DefaultMaxChunkLimit,
      chunkStringCount: Int = 1): Seq[String] = {
    require(charLimit > 0, "char_limit must be positive")
    require(overlapRate >= 0.0 && overlapRate <= 0.5, "overlap_rate must be within [0, 0.5]")
    if (content == null) return Seq.empty
    val out = ArrayBuffer.empty[String]
    val interval = charLimit - math.floor(charLimit * overlapRate).toInt
    var start = 0
    var done = false
    while (!done && start < content.length) {
      if (limitHit(out.size, maxChunkLimit, chunkStringCount)) {
        out += content.substring(start); done = true
      } else if (start + charLimit >= content.length) {
        out += content.substring(start, content.length); done = true
      } else {
        out += content.substring(start, start + charLimit)
        start += interval
      }
    }
    out.toSeq
  }
}
