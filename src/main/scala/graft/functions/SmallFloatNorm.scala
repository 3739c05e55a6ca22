package graft.functions

/** Lucene's SmallFloat norm-byte encoding for document lengths (the lossy
  * 4-mantissa-bit integer float BM25Similarity stores per doc and decodes
  * through its per-byte cache): values below `NumFreeValues` are exact;
  * above, the value keeps its 4 most significant bits (1 implicit) and the
  * shift is stored alongside — encode truncates, so decode∘encode yields
  * the LARGEST representable value ≤ the input. Reimplemented from the
  * published algorithm (lucene `util/SmallFloat` longToInt4/int4ToLong/
  * intToByte4/byte4ToInt); the oracle uses the truncation property — the
  * decoded-value table is monotone, so quantize(dl) ≡ max{v ≤ dl}. */
object SmallFloatNorm extends Serializable {

  private def longToInt4(i: Long): Int = {
    require(i >= 0, "only non-negative lengths")
    val numBits = 64 - java.lang.Long.numberOfLeadingZeros(i)
    if (numBits < 4) i.toInt
    else {
      val shift = numBits - 4
      // keep 4 significant bits, clear the implicit leading bit, pack the
      // shift above (0 reserved for the subnormal range)
      (((i >>> shift).toInt) & 0x07) | ((shift + 1) << 3)
    }
  }

  private def int4ToLong(i: Int): Long = {
    val bits = (i & 0x07).toLong
    val shift = (i >>> 3) - 1
    if (shift == -1) bits else (bits | 0x08L) << shift
  }

  val MaxInt4: Int = longToInt4(Int.MaxValue)
  val NumFreeValues: Int = 255 - MaxInt4

  def intToByte4(i: Int): Byte = {
    require(i >= 0, "only non-negative lengths")
    if (i < NumFreeValues) i.toByte
    else (NumFreeValues + longToInt4((i - NumFreeValues).toLong)).toByte
  }

  def byte4ToInt(b: Byte): Int = {
    val i = b & 0xff
    if (i < NumFreeValues) i
    else (NumFreeValues + int4ToLong(i - NumFreeValues)).toInt
  }

  /** The norm a Lucene-backed engine actually scores with for a doc of
    * `len` terms. */
  def quantize(len: Int): Int = byte4ToInt(intToByte4(len))

  /** All 256 decodable lengths, ascending — inlined by the oracle as a
    * VALUES list (quantize(dl) = max value ≤ dl). */
  def decodedValues: Seq[Int] = (0 to 255).map(i => byte4ToInt(i.toByte))
}
