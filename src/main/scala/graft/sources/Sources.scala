package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File sources (SURVEY.md §2.B "Scans/sources").
  *
  * The reference's only storage is a SQLite file; at cluster scale the
  * equivalents are columnar/line files with an EXPLICIT schema. Every
  * reader here takes a caller-supplied StructType — schema inference is
  * banned on the data path because it is a second full scan of the
  * input at 100 TB (and nondeterministic under sampling), and because
  * an explicit schema is what lets Catalyst prune columns and push
  * predicates into the scan.
  */
object Sources {

  /** Parquet — the primary format. Self-describing schema, columnar
    * pruning + min/max skipping for free. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Newline-delimited JSON with a declared schema. `mode=FAILFAST`
    * surfaces corrupt rows instead of silently nulling them;
    * `columnNameOfCorruptRecord` is not used because a 100 TB pipeline
    * wants the bad file identified, not a null-padded row. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .json(path)

  /** CSV with a declared schema. Same FAILFAST stance; header handling
    * explicit. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, failFast: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .csv(path)

  /** ORC — the other columnar interchange format a warehouse hands a
    * pipeline. Self-describing like parquet; Spark's native reader
    * prunes columns and pushes predicates the same way (the SourcesSpec
    * pushdown assert covers it). Declared schema is still accepted so
    * an unexpected upstream schema fails at analysis, not mid-job. */
  def orc(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.foreach(r.schema)
    r.orc(path)
  }
}
