package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

import org.apache.spark.sql.Row

/** Structured-Streaming ingest for `frequency = streaming` feature
  * groups (the reference declares the flag but never exercises it —
  * feature_store.py:33-34; this is the §7.2 phase-5 extension).
  *
  * Shape: file-source readStream → watermark → windowed/stateful
  * transforms → `foreachBatch` append into the same [[graft.fs.RecordLog]]
  * layout batch serving reads — one storage format, two ingestion modes.
  */
object StreamingFeatures {

  /** Streaming source over an events directory with the given schema.
    * `maxFilesPerTrigger=32` keeps micro-batches bounded at scale. */
  def readEvents(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 32)
      .parquet(path)

  /** Tumbling-window per-user aggregate features with late-data
    * handling: watermark bounds state, window closes emit append-mode
    * rows. These are the rolling features a streaming group serves. */
  def windowedUserFeatures(
      events: DataFrame,
      tsCol: String = "ts",
      userCol: String = "user_id",
      valueCol: String = "value",
      windowLen: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen), col(userCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("value_sum"),
        avg(col(valueCol)).as("value_mean"))
      .select(
        col(userCol),
        col("window.end").as("ts"),
        col("n_events"), col("value_sum"), col("value_mean"))

  /** Gap-based session features on a live stream — the streaming twin
    * of [[graft.operators.Sessionize]]: `session_window` merges events
    * whose gaps are below `gap` into one growing window per user, the
    * watermark closes sessions and bounds state. Emits one row per
    * closed session. */
  def sessionWindowFeatures(
      events: DataFrame,
      tsCol: String = "ts",
      userCol: String = "user_id",
      valueCol: String = "value",
      gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("value_sum"))
      .select(
        col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("value_sum"))

  /** Exactly-once-ish dedup within the watermark horizon before feature
    * computation (dropDuplicates keyed by event id, state bounded by
    * the watermark). */
  def dedupedStream(events: DataFrame, idCol: String, tsCol: String = "ts",
      lateness: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, lateness).dropDuplicates(idCol, tsCol)

  /** Sink: append each micro-batch into the record-log parquet layout
    * (partitioned by snapshot date, same as batch writes). */
  def toRecordLog(features: DataFrame, outDir: String,
      checkpoint: String): DataStreamWriter[Row] =
    features.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("10 seconds"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch
          .withColumn("p_date", to_date(col("ts")))
          .write.mode("append").partitionBy("p_date").parquet(outDir)
      }
}
