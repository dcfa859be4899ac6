package graft.fs

import java.sql.Timestamp

/** Catalog model — Spark-native re-expression of the reference's three
  * entities (reference: feature_store.py:37-123). Catalog rows are tiny
  * Datasets persisted as parquet; record data lives in wide columnar
  * tables per group (see [[RecordLog]]), not JSON blobs.
  */

/** A feature definition (reference: feature_store.py:37-67). `name` is
  * globally unique; `sourceQuery` is documentation only (never executed,
  * feature_store.py:163,227); `isActive` is a soft-delete flag; `id` is
  * the reference's uuid (feature_store.py:42,224), minted on register
  * when empty; `createdAt` None = unset (stamped on register — an
  * Option, not an epoch-0 sentinel, so a legitimate epoch-0 timestamp
  * round-trips). */
final case class FeatureDef(
    name: String,
    entityType: String,
    dtype: String,
    description: String = "",
    tags: Seq[String] = Seq.empty,
    sourceQuery: String = "",
    createdAt: Option[Timestamp] = None,
    isActive: Boolean = true,
    id: String = "")

/** A named, versioned set of features served together (reference:
  * feature_store.py:70-96). Schema evolution = new row at version n+1
  * (UNIQUE(name, version), feature_store.py:173-175). `id` is the
  * reference's uuid group_id (feature_store.py:74,291 — R5 lookups);
  * `createdAt` mirrors feature_store.py:88. */
final case class FeatureGroup(
    name: String,
    version: Int,
    features: Seq[String],
    entityKey: String,
    frequency: String = FeatureGroup.FreqBatch,
    id: String = "",
    createdAt: Option[Timestamp] = None)

object FeatureDef {
  /** Schema-migration default row: a `FeatureDef` built with ONLY the
    * required fields, so every optional field carries its actual
    * case-class default. [[FeatureCatalog]] backfills columns added to
    * the model since an on-disk catalog was written from this row —
    * the real declared defaults, not per-type conventions (ADVICE r4:
    * a future non-nullable Boolean defaulting to false would have been
    * silently backfilled as true by the old type-keyed rules). */
  val migrationDefault: FeatureDef = FeatureDef(name = "", entityType = "", dtype = "str")
}

object FeatureGroup {
  val FreqBatch = "batch"
  val FreqStreaming = "streaming"
  val Frequencies: Set[String] = Set(FreqBatch, FreqStreaming)
  /** See [[FeatureDef.migrationDefault]]. */
  val migrationDefault: FeatureGroup =
    FeatureGroup(name = "", version = 1, features = Seq.empty, entityKey = "")
}

object Dtypes {
  /** Declared dtypes (reference: feature_store.py:25-31). */
  val All: Set[String] = Set("int", "float", "str", "bool", "list")

  import org.apache.spark.sql.types._
  /** Spark mapping (SURVEY.md §1.4). */
  def toSpark(dtype: String): DataType = dtype match {
    case "int"   => LongType
    case "float" => DoubleType
    case "str"   => StringType
    case "bool"  => BooleanType
    case "list"  => ArrayType(DoubleType)
    case other   => throw new IllegalArgumentException(s"Invalid dtype: $other")
  }
}
