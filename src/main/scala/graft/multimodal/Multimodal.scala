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
  * training-data shapes. Actual media codecs are NOT in this container, so
  * the decode kernel is a clearly-marked deterministic stub; everything
  * Spark-side (schema, batching, partitioning, UDF signature) is real.
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

  /** STUB decode kernel: a real implementation would call an image/audio
    * codec here. The deterministic fake derives a feature vector from the
    * payload bytes so the full pipeline is testable end-to-end. */
  private[multimodal] def decodeToFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real codec goes here (libjpeg/ffmpeg not present in container)
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

  /** Frame sampling stub for video payloads: returns `n` deterministic
    * "frames" (byte slices) per payload — the partitioning/explode plumbing
    * of a real frame sampler. */
  def sampleFrames(df: DataFrame, payloadCol: String, n: Int = 4): DataFrame = {
    val sampleUdf = udf((payload: Array[Byte]) => {
      if (payload == null || payload.isEmpty) Seq.empty[Array[Byte]]
      else (0 until n).map { i =>
        val start = (payload.length.toLong * i / n).toInt
        val end = (payload.length.toLong * (i + 1) / n).toInt
        java.util.Arrays.copyOfRange(payload, start, math.max(end, start + 1))
      }
    })
    df.withColumn("frames", sampleUdf(col(payloadCol)))
      .select(col("*"), posexplode(col("frames")).as(Seq("frame_idx", "frame")))
      .drop("frames")
  }

  /** text+image multimodal embedding (the reference's exact surface). */
  def textImageEmbedding(df: DataFrame, textCol: String, imageB64Col: String,
      dst: String, dim: Int = HashEmbedder.DefaultDim): DataFrame = {
    val u = udf((t: String, img: String) => HashEmbedder.embedMultimodal(t, img, dim))
    df.withColumn(dst, u(col(textCol), col(imageB64Col)))
  }
}
