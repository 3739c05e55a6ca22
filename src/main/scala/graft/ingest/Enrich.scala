package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PruneUtils
import graft.ml.HashEmbedder

/** Ingest-side document enrichment — the Spark re-expression of the
  * reference's ingest processors (SURVEY.md §2.3):
  *   - text_embedding  (processor/TextEmbeddingProcessor.java)
  *   - sparse_encoding (processor/SparseEncodingProcessor.java, with prune)
  *   - text_chunking   (processor/TextChunkingProcessor.java)
  *   - text_image_embedding (processor/TextImageEmbeddingProcessor.java)
  *   - semantic-field system pipeline (processor/semantic) — chunk + embed +
  *     `<field>_semantic_info` struct population
  *   - skip_existing reuse (optimization/InferenceFilter.java): join with the
  *     previous corpus snapshot and reuse embeddings when the text is
  *     unchanged.
  *
  * The reference batches model calls (`InferenceProcessor.subBatchExecute`,
  * batch_size) — here inference is a deterministic pure function so plain
  * codegen'd UDF projection is the batching (one partition = one batch).
  */
object Enrich {

  val DefaultDim: Int = HashEmbedder.DefaultDim

  def embedUdf(dim: Int) = udf((s: String) => if (s == null) null else graft.ml.ModelRegistry.current.embedDense(s, dim))

  /** Ingest-side embedding for an asymmetric model: the reference's
    * TextEmbeddingProcessor always requests PASSAGE content
    * (TextEmbeddingProcessor.java:115); for symmetric configs this is
    * identical to `embedUdf`. */
  def embedPassageUdf(dim: Int, model: graft.ml.AsymmetricModel.ModelConfig) =
    udf((s: String) => if (s == null) null
      else graft.ml.AsymmetricModel.embed(s, graft.ml.AsymmetricModel.ContentType.Passage, model, dim))
  val encodeUdf = udf((s: String) => if (s == null) null else graft.ml.ModelRegistry.current.encodeSparse(s))

  /** Batched embedding via mapPartitions — the seam for a REAL inference
    * model: one model invocation per `batchSize` rows, mirroring the
    * reference's `AbstractBatchingProcessor.subBatchExecute` (default
    * semantic_ingest_batch_size = 10, NeuralSearchSettings.java:63-69).
    * With the deterministic HashEmbedder the output is identical to the
    * per-row UDF; swap `embedBatch` for a model client to get true batch
    * inference with per-batch amortized setup. */
  def embedBatched(df: DataFrame, src: String, dst: String,
      dim: Int = DefaultDim, batchSize: Int = 10): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
      texts.map(s => if (s == null) null else graft.ml.ModelRegistry.current.embedDense(s, dim))
    val schema = df.schema.add(dst, ArrayType(FloatType))
    val srcIdx = df.schema.fieldIndex(src)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val embs = embedBatch(batch.map(_.getString(srcIdx)))
        batch.zip(embs).map { case (row, e) =>
          Row.fromSeq(row.toSeq :+ (if (e == null) null else e.toSeq))
        }
      }
    }(Encoders.row(schema))
  }
  def encodePrunedUdf(pruneType: String, ratio: Float) = udf { (s: String) =>
    if (s == null) null
    else PruneUtils.prune(graft.ml.ModelRegistry.current.encodeSparse(s), PruneUtils.pruneType(pruneType), ratio)
  }
  def embedMultimodalUdf(dim: Int) =
    udf((t: String, img: String) => graft.ml.ModelRegistry.current.embedMultimodal(t, img, dim))

  def chunkFixedTokenUdf(tokenLimit: Int, overlapRate: Double, maxChunkLimit: Int) =
    udf((s: String) => Chunkers.fixedTokenLength(s, tokenLimit, overlapRate, maxChunkLimit))
  def chunkDelimiterUdf(delim: String, maxChunkLimit: Int) =
    udf((s: String) => Chunkers.delimiter(s, delim, maxChunkLimit))
  def chunkFixedCharUdf(charLimit: Int, overlapRate: Double, maxChunkLimit: Int) =
    udf((s: String) => Chunkers.fixedCharLength(s, charLimit, overlapRate, maxChunkLimit))

  /** text_embedding processor: add `<target>` dense vector per mapped field.
    * Field-map traversal semantics per the reference
    * (InferenceProcessor.java:443-447 buildNLPResult + ProcessorDocumentUtils,
    * exercised by the ingest_doc fixtures):
    *   - plain string column        → one embedding
    *   - dotted path ("a.b")        → nested struct sub-field
    *   - Array[String] column       → one embedding PER ELEMENT
    *   - Array[Struct{text,…}] with "arr.text" syntax → embed each
    *     element's text into a parallel array (nested_passages case)
    */
  def textEmbedding(df: DataFrame, fieldMap: Map[String, String], dim: Int = DefaultDim,
      model: graft.ml.AsymmetricModel.ModelConfig = graft.ml.AsymmetricModel.Symmetric): DataFrame =
    fieldMap.foldLeft(df) { case (d, (src, dst)) =>
      import org.apache.spark.sql.types._
      // asymmetric models embed ingest text as PASSAGE (TextEmbeddingProcessor.java:115);
      // for the symmetric default this is exactly embedUdf
      val emb = if (model.isAsymmetric) embedPassageUdf(dim, model) else embedUdf(dim)
      val parts = src.split("\\.")
      def typeAt(schema: StructType, path: Seq[String]): DataType =
        path.foldLeft(schema: DataType) {
          case (st: StructType, p) => st(p).dataType
          case (ArrayType(st: StructType, _), p) => ArrayType(st(p).dataType)
          case (other, p) => throw new IllegalArgumentException(s"cannot traverse $p in $other")
        }
      typeAt(d.schema, parts.toIndexedSeq) match {
        case StringType =>
          d.withColumn(dst, emb(col(src)))
        case ArrayType(StringType, _) =>
          d.withColumn(dst, transform(col(src), e => emb(e)))
        case other =>
          throw new IllegalArgumentException(s"unsupported field type for embedding: $other at $src")
      }
    }

  /** sparse_encoding processor with optional prune. */
  def sparseEncoding(df: DataFrame, fieldMap: Map[String, String],
      pruneType: String = "none", pruneRatio: Float = 0f): DataFrame =
    fieldMap.foldLeft(df) { case (d, (src, dst)) =>
      val u = if (pruneType == "none") encodeUdf else encodePrunedUdf(pruneType, pruneRatio)
      d.withColumn(dst, u(col(src)))
    }

  /** semantic-field system pipeline: `<field>_semantic_info.chunks[i] =
    * {text, embedding}` + model struct (SemanticInfoFieldConstants). */
  def semanticField(df: DataFrame, field: String, dim: Int = DefaultDim,
      chunked: Boolean = true, tokenLimit: Int = Chunkers.DefaultTokenLimit,
      dense: Boolean = true): DataFrame = {
    val chunksCol: Column =
      if (chunked) chunkFixedTokenUdf(tokenLimit, 0.0, Chunkers.DefaultMaxChunkLimit)(col(field))
      else array(col(field))
    // dense vs sparse embedding of the chunks follows the model config —
    // the decision SemanticMappingTransformer resolves from the model at
    // mapping time (FieldKind.Semantic.dense in our registry)
    def emb(c: Column): Column = if (dense) embedUdf(dim)(c) else encodeUdf(c)
    df.withColumn(s"${field}_semantic_info",
      struct(
        transform(chunksCol, c =>
          struct(c.as("text"), emb(c).as("embedding"))).as("chunks"),
        struct(lit("hash-embedder").as("id"),
          lit(if (dense) "dense" else "sparse").as("type")).as("model")))
  }

  /** Schema-driven enrichment — the ingest side of the
    * SemanticMappingTransformer analogue (graft.model.SemanticSchema): one
    * FieldSpec registry drives BOTH the derived schema and the enrichment
    * dataflow, so the produced DataFrame always matches
    * `deriveSemanticSchema(df.schema, specs)` (asserted here; the reference
    * guarantees the same by construction — system ingest processors are
    * generated from the transformed mapping, plugin/NeuralSearch.java:473-484).
    */
  def enrichBySpec(df: DataFrame, specs: Seq[graft.model.FieldSpec]): DataFrame = {
    import graft.model.{FieldKind, SemanticSchema}
    val out = specs.foldLeft(df) { (d, fs) =>
      fs.kind match {
        case s: FieldKind.Semantic =>
          semanticField(d, fs.name, s.dim, s.chunked, s.tokenLimit, s.dense)
        case FieldKind.Dense(dim) if d.schema(fs.name).dataType ==
            org.apache.spark.sql.types.StringType =>
          textEmbedding(d, Map(fs.name -> s"${fs.name}_emb"), dim)
        case FieldKind.Sparse(_) if d.schema(fs.name).dataType ==
            org.apache.spark.sql.types.StringType =>
          sparseEncoding(d, Map(fs.name -> s"${fs.name}_tokens"))
        case _ => d // already-concrete vector columns need no enrichment
      }
    }
    val derived = SemanticSchema.deriveSemanticSchema(df.schema, specs)
    require(out.schema.catalogString == derived.catalogString,
      s"enrichment diverged from derived schema:\n  got ${out.schema.catalogString}\n  want ${derived.catalogString}")
    out
  }

  /** skip_existing (TextEmbeddingInferenceFilter): reuse the previous
    * snapshot's embedding when the source text is unchanged. LEFT join on
    * doc id — previous snapshot is typically same-bucketed, so this is a
    * co-partitioned join at scale, and inference cost is paid only for
    * changed rows. */
  /** Multimodal skip_existing (TextImageEmbeddingInferenceFilter.java:20):
    * the reuse condition compares BOTH mapped inputs — a changed image with
    * unchanged text (or vice versa) must re-infer, since the single
    * embedding is a function of the pair. */
  def embedMultimodalWithSkipExisting(
      current: DataFrame, previous: DataFrame,
      docId: String, textCol: String, imageCol: String, dst: String,
      dim: Int = DefaultDim): DataFrame = {
    val prev = previous.select(
      col(docId).as("__prev_id"), col(textCol).as("__prev_text"),
      col(imageCol).as("__prev_img"), col(dst).as("__prev_emb"))
    current
      .join(prev, current(docId) === col("__prev_id"), "left")
      .withColumn(dst,
        when(col("__prev_text").isNotNull && col("__prev_text") === col(textCol)
          && col("__prev_img") <=> col(imageCol)
          && col("__prev_emb").isNotNull, col("__prev_emb"))
          .otherwise(embedMultimodalUdf(dim)(col(textCol), col(imageCol))))
      .drop("__prev_id", "__prev_text", "__prev_img", "__prev_emb")
  }

  def embedWithSkipExisting(
      current: DataFrame, previous: DataFrame,
      docId: String, src: String, dst: String, dim: Int = DefaultDim): DataFrame = {
    val prev = previous.select(
      col(docId).as("__prev_id"), col(src).as("__prev_src"), col(dst).as("__prev_emb"))
    current
      .join(prev, current(docId) === col("__prev_id"), "left")
      .withColumn(dst,
        // reuse only when a prior embedding actually EXISTS — a null prior
        // (partial backfill, failed ingest) must fall through to inference,
        // as the reference's InferenceFilter does
        when(col("__prev_src").isNotNull && col("__prev_src") === col(src)
          && col("__prev_emb").isNotNull, col("__prev_emb"))
          .otherwise(embedUdf(dim)(col(src))))
      .drop("__prev_id", "__prev_src", "__prev_emb")
  }
}
