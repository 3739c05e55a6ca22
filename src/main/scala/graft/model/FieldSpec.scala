package graft.model

import org.apache.spark.sql.types._

/** Field-type registry — the engine's counterpart of the reference's index
  * mappings (SURVEY.md §1.1/§1.2): a small declarative map from column name
  * to retrieval type, driving both schema derivation and query-time guards.
  *
  *   - Text: plain analyzed text (reference `text` field)
  *   - Dense(dim): knn_vector float[dim]
  *   - Sparse(seismic): rank_features token→weight map; `seismic = true`
  *     marks a SEISMIC-ANN-indexed field (reference `index.sparse` codec
  *     gate) — some request processors are invalid on those
  *     (NeuralSparseTwoPhaseProcessor.java:254-267)
  *   - Semantic: raw text + auto-derived `<field>_semantic_info` sibling
  *     (mapper/SemanticFieldMapper.java; dense vs sparse embedding comes
  *     from the model config, which SemanticMappingTransformer fetches at
  *     mapping time — here the registry carries it)
  */
sealed trait FieldKind
object FieldKind {
  case object Text extends FieldKind
  case class Dense(dim: Int) extends FieldKind
  case class Sparse(seismic: Boolean = false) extends FieldKind
  case class Semantic(
      modelId: String = "hash-embedder",
      dense: Boolean = true,
      dim: Int = 8,
      chunked: Boolean = true,
      tokenLimit: Int = 32) extends FieldKind
}

case class FieldSpec(name: String, kind: FieldKind)

/** The SemanticMappingTransformer analogue
  * (mappingtransformer/SemanticMappingTransformer.java, registered at
  * plugin/NeuralSearch.java:467-470): rewrite a user schema at
  * "index-creation" time, expanding every `semantic` field into its
  * concrete `<field>_semantic_info` structure. The reference fetches the
  * model config to decide dense-vs-sparse sub-fields; here the FieldSpec
  * registry carries that decision (FieldKind.Semantic.dense).
  */
object SemanticSchema {

  /** The `<field>_semantic_info` struct type for one semantic field spec —
    * constants/SemanticInfoFieldConstants.java: chunks[].{text, embedding}
    * + model{id, type}. */
  def semanticInfoType(spec: FieldKind.Semantic): StructType = {
    val embeddingType: DataType =
      if (spec.dense) ArrayType(FloatType)
      else MapType(StringType, FloatType)
    StructType(Seq(
      StructField("chunks", ArrayType(StructType(Seq(
        StructField("text", StringType),
        StructField("embedding", embeddingType))))),
      StructField("model", StructType(Seq(
        StructField("id", StringType, nullable = false),
        StructField("type", StringType, nullable = false))), nullable = false)))
  }

  /** Derive the enriched ("index") schema from a user schema + registry:
    * every Semantic spec appends its `<field>_semantic_info` sibling;
    * Dense/Sparse specs on TEXT columns describe ingest targets
    * (`<field>_emb` / `<field>_tokens`) the enrichment pipeline will
    * populate. Throws on specs naming absent or non-string columns —
    * the reference rejects invalid semantic mappings at transform time. */
  def deriveSemanticSchema(userSchema: StructType, specs: Seq[FieldSpec]): StructType =
    specs.foldLeft(userSchema) { (schema, fs) =>
      fs.kind match {
        case s: FieldKind.Semantic =>
          requireStringField(schema, fs.name, "semantic")
          StructType(schema.fields :+
            StructField(s"${fs.name}_semantic_info", semanticInfoType(s)))
        case FieldKind.Dense(_) if schema.fieldNames.contains(fs.name) &&
            schema(fs.name).dataType == StringType =>
          // dense spec on a text column = ingest-time text_embedding target
          StructType(schema.fields :+
            StructField(s"${fs.name}_emb", ArrayType(FloatType)))
        case FieldKind.Sparse(_) if schema.fieldNames.contains(fs.name) &&
            schema(fs.name).dataType == StringType =>
          StructType(schema.fields :+
            StructField(s"${fs.name}_tokens", MapType(StringType, FloatType)))
        case _ =>
          // Dense/Sparse over an existing vector column: already concrete
          require(schema.fieldNames.contains(fs.name),
            s"field spec names absent column: ${fs.name}")
          schema
      }
    }

  private def requireStringField(schema: StructType, name: String, kind: String): Unit = {
    require(schema.fieldNames.contains(name),
      s"$kind field spec names absent column: $name")
    require(schema(name).dataType == StringType,
      s"$kind field must be a string column, got ${schema(name).dataType.catalogString} for $name")
  }

  /** SEISMIC-indexed field names (for request-processor guards). */
  def seismicFields(specs: Seq[FieldSpec]): Set[String] =
    specs.collect { case FieldSpec(n, FieldKind.Sparse(true)) => n }.toSet
}
