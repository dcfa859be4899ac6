package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling: per-column null counts, exact distinct counts, and
  * canonical min/max — the data-quality sweep a pipeline runs before
  * trusting a new drop of upstream data (schema drift, null storms,
  * constant columns, truncated domains all surface here).
  *
  * One `agg` over the table computes every column's stats in a single
  * pass; the multiple `count(DISTINCT …)` aggregates make Catalyst plan
  * an Expand (one replicated stream per distinct column) feeding one
  * hash aggregate — a single scan and a single exchange of partial
  * states, not one job per column. At the 100 TB end exact distinct of
  * a high-cardinality column is the expensive part; the scale path is
  * swapping `countDistinct` for `approx_count_distinct` (HLL, mergeable,
  * no Expand) — same output shape, bounded error (OperatorsSpec bounds
  * HLL against the exact count).
  *
  * min/max leave the engine as CANONICAL STRINGS so one result schema
  * fits every column type: integers via plain cast, floats through
  * decimal(30,6) (fixed scale — engines' shortest-roundtrip float
  * printers disagree on exponent thresholds, decimals print alike),
  * timestamps via `yyyy-MM-dd HH:mm:ss`, strings as-is.
  */
object Profile {

  private def canon(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType => c.cast(DecimalType(30, 6)).cast(StringType)
    // decimals re-render at the fixed canonical scale too — a native-
    // scale decimal would print '123.45' where the contract says
    // '123.450000' (ADVICE r5). Values that cannot carry 6 fractional
    // digits in 30 total (>24 integer digits) would overflow the cast
    // to null and masquerade as missing data — those keep their native
    // rendering instead (documented deviation, not a silent null).
    case d: DecimalType if d.precision - d.scale <= 24 =>
      c.cast(DecimalType(30, 6)).cast(StringType)
    case TimestampType => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case DateType => date_format(c, "yyyy-MM-dd")
    case _ => c.cast(StringType)
  }

  /** Profile every column of `df`: one row per column with
    * (col_name, n_rows, n_nulls, n_distinct, min_s, max_s),
    * ordered by column name. */
  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs: Seq[Column] = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(lit(1)).as(s"__n_${f.name}"),
        sum(c.isNull.cast("long")).as(s"__nulls_${f.name}"),
        countDistinct(c).as(s"__dist_${f.name}"),
        // min/max in the NATIVE type (a lexicographic string min would
        // put "10" before "9"), canonicalized at the edge
        canon(min(c), f.dataType).as(s"__min_${f.name}"),
        canon(max(c), f.dataType).as(s"__max_${f.name}"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // fan the single stats row out to one row per column
    val rows = fields.map { f =>
      struct(
        lit(f.name).as("col_name"),
        col(s"__n_${f.name}").as("n_rows"),
        col(s"__nulls_${f.name}").as("n_nulls"),
        col(s"__dist_${f.name}").as("n_distinct"),
        col(s"__min_${f.name}").as("min_s"),
        col(s"__max_${f.name}").as("max_s"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }

  /** Equi-width histogram of a FIXED-POINT numeric column (values with
    * `scale` decimal digits, e.g. money at scale=2), computed entirely
    * in integer space: the value is scaled to units
    * (`round(v·10^scale)` — exact, both engines round the same double),
    * and the bin is `(units − min)·k div (max − min + 1)` — integer
    * floor division of non-negative operands, so no float boundary can
    * flip a row's bin between engines (the failure mode of the
    * textbook `floor((v-min)/width)`).
    *
    * Shape: one tiny min/max aggregate broadcast back, then one
    * map-side bin computation + one k-row aggregate. */
  def histogram(df: DataFrame, valueCol: String, k: Int,
      scale: Int = 2): DataFrame = {
    require(k > 0, s"histogram: k must be positive, got $k")
    val mul = math.pow(10, scale)
    val units = round(col(valueCol) * mul).cast("long")
    val st = df.filter(col(valueCol).isNotNull)
      .agg(min(units).as("lo"), max(units).as("hi"))
    df.filter(col(valueCol).isNotNull)
      .crossJoin(broadcast(st))
      .withColumn("bin",
        expr(s"(CAST(round($valueCol * $mul) AS BIGINT) - lo) * $k div (hi - lo + 1)")
          .cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(col(valueCol)), 6).as("min_v"),
        round(max(col(valueCol)), 6).as("max_v"))
      .orderBy(col("bin"))
  }

  /** Key-skew diagnosis: histogram of per-key row counts in power-of-
    * two buckets — the pre-flight check before keying a join or window
    * on a column (a key whose top bucket holds millions of rows needs
    * salting / AQE skew handling; see [[graft.operators.SkewJoin]]).
    *
    * The bucket is `floor(log2 n) + 1` computed as the BIT LENGTH of
    * the count (`length(bin(n))`) — pure integer arithmetic, because
    * float log2 is a libm call that lands on x.999… at exact powers of
    * two and buckets differently between engines.
    *
    * Shape: one count aggregate on the key (map-side combine absorbs
    * the very skew being measured) + one tiny bucket aggregate. */
  def keySkew(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .withColumn("bucket", length(bin(col("n"))).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_keys"),
        min(col("n")).as("min_n"), max(col("n")).as("max_n"))
      .orderBy(col("bucket"))
}
