package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.apache.spark.sql.Column

/** Loaders + determinism helpers shared by every declared query.
  *
  * Determinism conventions (SURVEY.md §7.3): float aggregates go through
  * exact decimal(18,2) sums and are cast back to double so Spark and the
  * DuckDB oracle see bit-identical values regardless of partial-agg
  * ordering; event timestamps (normalized to TimestampType by [[events]])
  * are only ever emitted as formatted strings.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Rebalance an under-split scan across the session's cores.
    *
    * Parquet splits at ROW-GROUP granularity: a table written as one
    * file with one row group is a one-task scan no matter how
    * maxPartitionBytes is tuned, so every map-side computation over it
    * (JSON parse, regex, shingling, decimal math) runs on one core of
    * 32. When the source yields fewer splits than half the cores, one
    * round-robin exchange of the (by definition small) input buys full
    * parallelism for everything downstream. At 100 TB this is a no-op:
    * real tables have thousands of row groups, so the condition never
    * fires and no shuffle is added. */
  private def rebalance(s: SparkSession, df: DataFrame): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
  }

  def region(s: SparkSession, d: String)    = t(s, d, "region")
  def nation(s: SparkSession, d: String)    = t(s, d, "nation")
  def customer(s: SparkSession, d: String)  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = t(s, d, "supplier")
  def part(s: SparkSession, d: String)      = t(s, d, "part")
  def orders(s: SparkSession, d: String)    = rebalance(s, t(s, d, "orders"))
  def lineitem(s: SparkSession, d: String)  = rebalance(s, t(s, d, "lineitem"))
  /** events.ts normalization — the testdata generator has shipped two
    * physical types over time, and the loader accepts both so every ts
    * consumer sees plain TimestampType:
    *  - parquet timestamp[us] tz-naive (current): Spark 4 infers
    *    TIMESTAMP_NTZ; under the pinned UTC session TZ the cast to
    *    TimestampType is lossless.
    *  - parquet timestamp[ns] (older): Spark refuses it outright
    *    (PARQUET_TYPE_ILLEGAL) unless spark.sql.legacy.parquet.nanosAsLong
    *    is set (Verify/Bench/tests keep it, defensively); the column then
    *    arrives as Long nanos, floor-divided to micros in integer space
    *    (a double division would lose precision at 1e18). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = rebalance(s, t(s, d, "events"))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String) = rebalance(s, t(s, d, "documents"))
  def embeddings(s: SparkSession, d: String) = rebalance(s, t(s, d, "embeddings"))

  /** Exact money sum: sum over decimal(18,2) (no float drift), back to
    * double for a type the oracle hash-compares cleanly. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact mean built from the exact sum — identical IEEE division on
    * both engines; round at the edge. */
  def dmean(c: Column): Column = round(dsum(c) / count(c), 6)

  /** Timestamps only leave the engine as strings (micros precision drift
    * between Spark and DuckDB on timestamp[ns] columns otherwise). */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
