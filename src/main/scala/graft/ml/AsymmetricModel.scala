package graft.ml

/** Asymmetric text-embedding models — query vs passage content types.
  *
  * Reference surface:
  *   - ml/AsymmetricModelDetector.java: a model is asymmetric when its config
  *     carries a query_prefix and/or passage_prefix (local
  *     TextEmbeddingModelConfig) or an explicit is_asymmetric flag (remote).
  *   - processor/EmbeddingContentType.java: QUERY | PASSAGE.
  *   - processor/TextEmbeddingProcessor.java:115 — ingest always embeds with
  *     PASSAGE; query/NeuralQueryBuilder.java:923,1162,1190 — query-side
  *     inference always embeds with QUERY.
  *   - ml/NeuralSearchMLInputBuilder.java — applies the content type to the
  *     inference request (prefixing is done model-side; our deterministic
  *     stand-in applies the prefix to the input text, which is the observable
  *     semantics: query and passage embeddings of the same string differ).
  *
  * For a symmetric model (no prefixes) the content type is a no-op, exactly
  * as in the reference where the parameters are only attached when
  * `AsymmetricModelDetector.isAsymmetricModel` is true.
  */
object AsymmetricModel {

  sealed trait ContentType
  object ContentType {
    case object Query extends ContentType
    case object Passage extends ContentType
  }

  /** Model config subset the detector looks at (TextEmbeddingModelConfig
    * query_prefix/passage_prefix; remote additional_config is_asymmetric). */
  final case class ModelConfig(
      queryPrefix: Option[String] = None,
      passagePrefix: Option[String] = None,
      isAsymmetricFlag: Boolean = false) {

    /** AsymmetricModelDetector.isAsymmetricModel: any prefix present, or the
      * remote-model explicit flag. */
    def isAsymmetric: Boolean =
      isAsymmetricFlag || queryPrefix.isDefined || passagePrefix.isDefined

    /** The text the model actually embeds for a given content type. Prefixes
      * apply only when the model is asymmetric; a missing prefix for the
      * requested side means the raw text (reference models may declare only
      * one of the two). */
    def inputFor(text: String, contentType: ContentType): String =
      if (text == null || !isAsymmetric) text
      else contentType match {
        case ContentType.Query   => queryPrefix.fold(text)(_ + text)
        case ContentType.Passage => passagePrefix.fold(text)(_ + text)
      }
  }

  val Symmetric: ModelConfig = ModelConfig()

  /** Content-type-aware dense embedding: the asymmetric analogue of
    * HashEmbedder.embed. */
  def embed(text: String, contentType: ContentType,
      config: ModelConfig, dim: Int = HashEmbedder.DefaultDim): Array[Float] =
    ModelRegistry.current.embedDense(config.inputFor(text, contentType), dim)
}
