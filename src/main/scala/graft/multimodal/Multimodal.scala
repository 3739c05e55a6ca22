package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ml.HashEmbedder

/** Multimodal column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` columns + typed metadata struct, with decode /
  * feature-extract / resize / frame-sample as batched per-partition
  * transforms (the Scala analogue of `mapInPandas`: one iterator pass per
  * partition, batch-shaped work inside).
  *
  * The reference's multimodal surface is the 2-key {inputText, inputImage}
  * inference map (processor/TextImageEmbeddingProcessor.java,
  * query/NeuralQueryBuilder.java:914-919) — extended here to the standard
  * training-data shapes. Image decode is REAL (in-JDK javax.imageio:
  * PNG/JPEG/GIF/BMP); non-image payloads fall back to a deterministic
  * byte-hash kernel so synthetic corpora stay oracle-checkable. Audio/video
  * codecs are not in this container — frame sampling remains a byte-slice
  * stand-in; the Spark-side plumbing (schema, batching, partitioning, UDF
  * signature) is real throughout.
  */
object Multimodal {

  /** media column schema: binary payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("payload", BinaryType),
    StructField("media_type", StringType), // image | audio | video
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Cheap magic-byte probe for the formats the in-JDK codecs decode —
    * gates ImageIO so non-image payloads (the common case in a mixed
    * corpus) never pay reader iteration or ImageIO's temp-file cache. */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') || // PNG
      (p(0) == 0xff.toByte && p(1) == 0xd8.toByte && p(2) == 0xff.toByte) || // JPEG
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||          // GIF
      (p(0) == 'B' && p(1) == 'M'))                                          // BMP

  /** Real image decode via the in-JDK `javax.imageio` codecs (PNG, JPEG,
    * GIF, BMP — no external dependency). Returns None for payloads that
    * are not a decodable image. */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (payload == null || payload.length < 4 || !looksLikeImage(payload)) None
    else
      // NonFatal, not just IOException: a payload that passes the 4-byte
      // magic probe but is structurally malformed makes ImageIO plugins
      // throw IllegalArgumentException / IndexOutOfBounds / NegativeArraySize
      // — in a 100 TB mixed corpus those rows must fall back to None, not
      // fail the task
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic pixel features for a decoded image: luminance histogram
    * over `dim` buckets (ITU-R 601 integer luma), L2-normalized — the same
    * feature-vector contract as the hash kernel, derived from real pixels. */
  def imageFeatures(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    val w = img.getWidth; val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
        v(lum * dim / 256) += 1f
        x += 1
      }
      y += 1
    }
    HashEmbedder.l2normalize(v)
  }

  /** Image resize through the in-JDK raster pipeline (Graphics2D bilinear) —
    * the decode-side `resize` transform of a real multimodal pipeline. */
  def resizeImage(img: java.awt.image.BufferedImage, width: Int, height: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, width, height, null)
    } finally g.dispose()
    out
  }

  // ----------------------------------------------------------------- audio

  /** RIFF/WAVE magic probe — same role as [[looksLikeImage]]: gate the
    * JDK decoder so opaque payloads never pay stream-parser setup. */
  private def looksLikeWav(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** Real audio decode via the in-JDK `javax.sound.sampled` codecs (PCM
    * WAV — no external dependency), mirroring the imageio seam: probe →
    * decode → None on anything malformed. Returns mono samples in [-1, 1]
    * (channels averaged). */
  def decodeAudio(payload: Array[Byte]): Option[Array[Float]] =
    if (payload == null || !looksLikeWav(payload)) None
    else
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val enc = fmt.getEncoding
          val ok = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          val bits = fmt.getSampleSizeInBits
          if (!ok || (bits != 8 && bits != 16)) None
          else {
            val bytes = in.readAllBytes()
            val ch = fmt.getChannels
            val bytesPerSample = bits / 8
            val frameBytes = bytesPerSample * ch
            val nFrames = bytes.length / frameBytes
            val out = new Array[Float](nFrames)
            var f = 0
            while (f < nFrames) {
              var acc = 0f
              var c = 0
              while (c < ch) {
                val o = f * frameBytes + c * bytesPerSample
                val s =
                  if (bits == 8) {
                    if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
                      ((bytes(o) & 0xff) - 128) / 128f
                    else bytes(o) / 128f
                  } else {
                    val b0 = bytes(o) & 0xff; val b1 = bytes(o + 1) & 0xff
                    val u = if (fmt.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0
                    // unsigned 16-bit is offset-binary: rebase around 0x8000;
                    // signed is two's-complement (sign-extend via toShort)
                    val raw =
                      if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED) u - 32768
                      else u.toShort.toInt
                    raw / 32768f
                  }
                acc += s
                c += 1
              }
              out(f) = acc / ch
              f += 1
            }
            Some(out)
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic features for decoded audio: RMS energy over `dim` equal
    * time windows, L2-normalized — the audio analogue of the luminance
    * histogram (same feature-vector contract, derived from real samples). */
  def audioFeatures(samples: Array[Float], dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    if (samples.nonEmpty) {
      var b = 0
      while (b < dim) {
        val start = (samples.length.toLong * b / dim).toInt
        val end = math.max((samples.length.toLong * (b + 1) / dim).toInt, start + 1)
        var acc = 0.0
        var i = start
        while (i < end && i < samples.length) { acc += samples(i).toDouble * samples(i); i += 1 }
        v(b) = math.sqrt(acc / math.max(1, math.min(end, samples.length) - start)).toFloat
        b += 1
      }
    }
    HashEmbedder.l2normalize(v)
  }

  // ----------------------------------------------------------------- video

  /** Container magic probe for the common video wrappers (MP4 `ftyp` box,
    * RIFF AVI, Matroska EBML) — the gate in front of [[videoDecoder]]. */
  private[multimodal] def looksLikeVideo(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 && (
      (p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p') ||          // MP4/MOV
      (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'A' && p(9) == 'V' && p(10) == 'I') ||                        // AVI
      (p(0) == 0x1a.toByte && p(1) == 0x45.toByte && p(2) == 0xdf.toByte &&
        p(3) == 0xa3.toByte))                                                 // MKV/WebM

  /** Pluggable video decode hook — the drop-in seam (no video codec ships
    * in the JDK): given (payload, frameCount), return decoded frame images
    * or None to fall through to the container parse / byte-slice chain. A
    * real deployment assigns e.g. a JavaCV/ffmpeg-backed function ONCE per
    * executor; every consumer ([[sampleFrames]]) picks it up through the
    * same probe → decode → fallback chain the image and audio paths use. */
  @volatile var videoDecoder: (Array[Byte], Int) => Option[Seq[Array[Byte]]] =
    (_, _) => None

  // ---- container-header frame index (no codec: offsets only) ----

  private def be32(p: Array[Byte], o: Int): Long =
    ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
      ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
  private def le32(p: Array[Byte], o: Int): Long =
    ((p(o + 3) & 0xffL) << 24) | ((p(o + 2) & 0xffL) << 16) |
      ((p(o + 1) & 0xffL) << 8) | (p(o) & 0xffL)
  private def fourcc(p: Array[Byte], o: Int): String =
    new String(p, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** MP4/ISO-BMFF: walk the box tree (size:BE32, type:4cc; size 1 =
    * 64-bit largesize, size 0 = to-EOF) for the `mdat` bounds and the
    * `moov/trak/mdia/minf/stbl` sample tables — `stco` chunk offsets are
    * absolute file offsets and `stsz` carries per-sample sizes. With one
    * sample per chunk (the stsz/stco cardinality match) each frame range
    * is exact; otherwise ranges fall back to chunk granularity ending at
    * the next chunk or mdat end. Pure header arithmetic — the same
    * information a real demuxer seeks with, no codec required. */
  private def mp4FrameRanges(p: Array[Byte]): Seq[(Int, Int)] = {
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    var mdat: Option[(Int, Int)] = None
    var stco: Seq[Long] = Nil
    var stsz: Seq[Long] = Nil
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var o = from
      while (o + 8 <= to && depth < 8) {
        val rawSize = be32(p, o)
        val typ = fourcc(p, o + 4)
        val (size, hdr) =
          if (rawSize == 1L && o + 16 <= to) {
            val hi = be32(p, o + 8); val lo = be32(p, o + 12)
            ((hi << 32) | lo, 16)
          } else if (rawSize == 0L) ((to - o).toLong, 8)
          else (rawSize, 8)
        if (size < hdr || o + size > to) return // malformed: stop this level
        val bodyStart = o + hdr
        val bodyEnd = (o + size).toInt
        typ match {
          case "mdat" => mdat = mdat.orElse(Some((bodyStart, bodyEnd)))
          case t if containers.contains(t) => walk(bodyStart, bodyEnd, depth + 1)
          case "stco" if bodyStart + 8 <= bodyEnd =>
            val n = be32(p, bodyStart + 4).toInt
            stco = (0 until n).takeWhile(i => bodyStart + 8 + i * 4 + 4 <= bodyEnd)
              .map(i => be32(p, bodyStart + 8 + i * 4))
          case "stsz" if bodyStart + 12 <= bodyEnd =>
            val fixed = be32(p, bodyStart + 4)
            val n = be32(p, bodyStart + 8).toInt
            stsz =
              if (fixed != 0L) Seq.fill(n)(fixed)
              else (0 until n).takeWhile(i => bodyStart + 12 + i * 4 + 4 <= bodyEnd)
                .map(i => be32(p, bodyStart + 12 + i * 4))
          case _ =>
        }
        o = bodyEnd
      }
    }
    walk(0, p.length, 0)
    val dataEnd = mdat.map(_._2).getOrElse(p.length)
    val offs = stco.filter(c => c >= 0 && c < p.length)
    if (offs.isEmpty) mdat.toSeq.filter { case (s, e) => e > s }
    else if (stsz.length == offs.length)
      offs.zip(stsz).flatMap { case (s, len) =>
        val e = math.min(s + len, dataEnd)
        if (e > s) Some((s.toInt, e.toInt)) else None
      }
    else
      offs.zip(offs.drop(1) :+ dataEnd.toLong).flatMap { case (s, e) =>
        if (e > s) Some((s.toInt, math.min(e, p.length).toInt)) else None
      }
  }

  /** AVI/RIFF: walk chunks ([fourcc][size:LE32][data], even-padded),
    * descending into LIST containers, and index the `movi` payload chunks
    * whose fourcc matches the `##db`/`##dc` (video frame) convention —
    * each chunk's data range IS one frame's bytes. */
  private def aviFrameRanges(p: Array[Byte]): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    def frames(cc: String): Boolean =
      cc.length == 4 && cc(0).isDigit && cc(1).isDigit &&
        cc(2) == 'd' && (cc(3) == 'b' || cc(3) == 'c')
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var o = from
      while (o + 8 <= to && depth < 8) {
        val cc = fourcc(p, o)
        val size = le32(p, o + 4).toInt
        val dataStart = o + 8
        val dataEnd = dataStart + size
        if (size < 0 || dataEnd > to) return
        if (cc == "LIST" && size >= 4) walk(dataStart + 4, dataEnd, depth + 1)
        else if (frames(cc) && dataEnd > dataStart) out += ((dataStart, dataEnd))
        o = dataEnd + (size & 1) // even padding
      }
    }
    walk(12, p.length, 0) // skip RIFF header (RIFF, size, 'AVI ')
    out.result()
  }

  /** Container-header frame index for a probed video payload: MP4 sample
    * tables or AVI movi chunks → [start, end) byte ranges of the declared
    * frames. None when the container is corrupt or declares nothing —
    * callers fall through to the byte-slice stand-in, mirroring the
    * image/audio decode seams. */
  private[multimodal] def parseFrameRanges(p: Array[Byte]): Option[Seq[(Int, Int)]] =
    try {
      val ranges =
        if (p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p') mp4FrameRanges(p)
        else if (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
          p(8) == 'A' && p(9) == 'V' && p(10) == 'I') aviFrameRanges(p)
        else Seq.empty // MKV/EBML: varint-coded tree, no fixed-offset tables
      if (ranges.isEmpty) None else Some(ranges)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode kernel: real decode per modality when a codec exists — image
    * (javax.imageio → luminance histogram), audio (javax.sound.sampled WAV
    * → windowed RMS) — otherwise the deterministic byte-hash fallback
    * (synthetic corpora carry opaque payloads — the oracle replicates the
    * fallback arithmetic). Every modality goes probe → decode → fallback;
    * a new codec plugs into its decode slot without touching the plan. */
  private[multimodal] def decodeToFeatures(payload: Array[Byte], dim: Int): Array[Float] =
    decodeImage(payload).map(imageFeatures(_, dim))
      .orElse(decodeAudio(payload).map(audioFeatures(_, dim)))
      .getOrElse {
        val v = new Array[Float](dim)
        if (payload != null) {
          var i = 0
          while (i < payload.length) {
            v(math.floorMod(payload(i) + i * 31, dim)) += 1f
            i += 1
          }
        }
        HashEmbedder.l2normalize(v)
      }

  /** Batched feature extraction over the binary payload column —
    * mapPartitions so a real codec would amortize per-batch model/codec
    * init exactly like the reference's batched inference
    * (InferenceProcessor.subBatchExecute, batch_size). */
  def extractFeatures(df: DataFrame, payloadCol: String, dim: Int = 8,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add("media_features", ArrayType(FloatType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch: real impl would run one codec/model call for the batch
        batch.map { row =>
          val payload = row.get(payloadIdx).asInstanceOf[Array[Byte]]
          Row.fromSeq(row.toSeq :+ decodeToFeatures(payload, dim).toSeq)
        }
      }
    }(encoder)
  }

  /** Frame sampling for video payloads — probe → decode → parse → slice:
    * container-probed payloads try the pluggable [[videoDecoder]] (real
    * decoded frames when a codec is registered), then the codec-less
    * [[parseFrameRanges]] header walk (REAL frame byte ranges from the
    * MP4 sample tables / AVI movi chunks, evenly sampled down to `n`);
    * everything else — opaque payloads, corrupt containers — gets `n`
    * deterministic byte slices, preserving the partitioning/explode
    * plumbing of a real frame sampler. */
  def sampleFrames(df: DataFrame, payloadCol: String, n: Int = 4): DataFrame = {
    val sampleUdf = udf((payload: Array[Byte]) => {
      val decoded =
        if (looksLikeVideo(payload))
          videoDecoder(payload, n).orElse(
            parseFrameRanges(payload).map { ranges =>
              val take =
                if (ranges.length <= n) ranges
                else (0 until n).map(i => ranges((ranges.length.toLong * i / n).toInt))
              take.map { case (s, e) => java.util.Arrays.copyOfRange(payload, s, e) }
            })
        else None
      decoded.getOrElse {
        if (payload == null || payload.isEmpty) Seq.empty[Array[Byte]]
        else (0 until n).map { i =>
          val start = (payload.length.toLong * i / n).toInt
          val end = (payload.length.toLong * (i + 1) / n).toInt
          java.util.Arrays.copyOfRange(payload, start, math.max(end, start + 1))
        }
      }
    })
    df.withColumn("frames", sampleUdf(col(payloadCol)))
      .select(col("*"), posexplode(col("frames")).as(Seq("frame_idx", "frame")))
      .drop("frames")
  }

  /** text+image multimodal embedding (the reference's exact surface). */
  def textImageEmbedding(df: DataFrame, textCol: String, imageB64Col: String,
      dst: String, dim: Int = HashEmbedder.DefaultDim): DataFrame = {
    val u = udf((t: String, img: String) => graft.ml.ModelRegistry.current.embedMultimodal(t, img, dim))
    df.withColumn(dst, u(col(textCol), col(imageB64Col)))
  }
}
