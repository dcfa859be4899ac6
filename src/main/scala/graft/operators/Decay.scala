package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-decayed feature aggregates — the recency-weighted sums feature
  * stores serve next to plain totals ("spend, but recent spend counts
  * more"). A float `exp(-λ·age)` weight is not cross-engine
  * reproducible (libm) and a float Σ is aggregation-order-sensitive;
  * this is the ENGINE-EXACT form: staircase exponential decay with
  * per-day granularity and an integer halflife —
  *
  *   weight(row) = 2^(−e),  e = floor(age_days / halflifeDays)
  *
  * computed as pure integers: each term is sv · 2^(maxE−e) (sv = the
  * value at its fixed-point scale, the shift exact), summed as BIGINT
  * (order-free), divided ONCE at the edge by 10^scale · 2^maxE. Rows
  * older than maxE halflives carry exactly 0 — an explicit forgetting
  * window, not an underflow accident. Everything replays in SQL
  * (datediff on calendar dates, CASE + bit shift).
  *
  * Scale shape: one map-side projection + one keyed aggregate — the
  * same plan as any grouped sum. Term magnitude is sv·2^maxE
  * (≈ 10^12 at default scales), so ~10^6 rows/key fit BIGINT; beyond
  * that, pre-aggregate per (key, e) first (the e-axis is ≤ maxE+1
  * values) and fold the bounded per-bucket sums.
  */
object Decay {

  /** Per-key decayed sum as of `asOfDate` (exclusive upper bound, a
    * 'yyyy-MM-dd' day): (key, n_recent, decayed_sum) where n_recent
    * counts rows inside the maxE-halflife window and decayed_sum is
    * Σ value·2^(−floor(age/halflife)) rounded to 6dp. Rows at or
    * after the anchor (negative age) are excluded — the PIT
    * discipline: a feature computed as-of T must not see the future. */
  def decayedSum(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, asOfDate: String, halflifeDays: Int,
      scale: Int = 2, maxE: Int = 20): DataFrame = {
    require(halflifeDays >= 1, s"halflifeDays=$halflifeDays")
    require(maxE >= 1 && maxE <= 40, s"maxE=$maxE")
    val mult = math.pow(10.0, scale)
    val base = df
      .filter(col(valueCol).isNotNull &&
        col(tsCol) < to_timestamp(lit(s"$asOfDate 00:00:00")))
      .select(col(keyCol).as("key"),
        round(col(valueCol) * mult).cast("long").as("sv"),
        floor(datediff(to_date(lit(asOfDate)), to_date(col(tsCol)))
          .cast("double") / halflifeDays).cast("long").as("e"))
      .filter(col("e") >= 0)
    base
      // the Scala shiftleft() helper takes only a literal shift; the
      // SQL ShiftLeft expression accepts a column
      .withColumn("term", when(col("e") <= maxE,
        col("sv") * expr(s"shiftleft(1L, cast($maxE - e as int))"))
        .otherwise(lit(0L)))
      .groupBy(col("key"))
      .agg(
        sum(when(col("e") <= maxE, 1L).otherwise(0L)).as("n_recent"),
        sum(col("term")).as("s"))
      .select(col("key").as(keyCol), col("n_recent"),
        round(col("s").cast("double") /
          lit(mult * (1L << maxE).toDouble), 6).as("decayed_sum"))
  }
}
