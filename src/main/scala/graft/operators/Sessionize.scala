package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization + rolling features over an event log — the
  * gap-based session assignment every behavioral-feature pipeline
  * needs. One shuffle on the entity key; both the lag and the running
  * sum reuse the same `(key) ORDER BY ts` sort order, so Catalyst plans
  * a single Window exchange+sort.
  */
object Sessionize {

  /** Assign `session_id` (0-based per user) with a new session whenever
    * the gap to the previous event exceeds `gapSeconds`. `tieBreak`
    * disambiguates equal timestamps (without it, lag/running-sum order
    * among same-ts events is nondeterministic — VERDICT r2 #5). */
  def assign(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long, tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol) +: tieBreak.map(col): _*)
    val gap = unix_timestamp(col(tsCol)) -
      unix_timestamp(lag(col(tsCol), 1).over(w))
    events
      .withColumn("__new_session",
        when(gap.isNull || gap > gapSeconds, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("__new_session")
  }

  /** Per-session aggregates (event count, span seconds, value sum). */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, gapSeconds: Long,
      tieBreak: Seq[String] = Seq.empty): DataFrame =
    assign(events, userCol, tsCol, gapSeconds, tieBreak)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .as("span_seconds"),
        graft.Tables.dsum(col(valueCol)).as("value_sum"))
}
