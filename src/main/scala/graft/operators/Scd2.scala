package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build over an append-only
  * snapshot log — the compaction step between a feature-store record
  * log (reference `feature_store.py:360-368` appends every write) and
  * an interval table a training join can range-probe.
  *
  * Two stages, both windows over the SAME (key, order) exchange+sort —
  * Catalyst reuses one Exchange and one Sort for `lag`/`lead` on the
  * same window spec, so the whole history build costs a single shuffle
  * of the log:
  *
  *  1. '''Change compaction''' (CDC dedup): a snapshot row survives only
  *     if any tracked column differs from the key's previous snapshot —
  *     the no-op writes that dominate append-only logs (a daily job
  *     re-writing an unchanged value) are dropped map-side after the
  *     sort, shrinking the history by the no-change ratio before it is
  *     ever stored.
  *  2. '''Intervalization''': each surviving change opens a validity
  *     interval `[valid_from, valid_to)` closed by the key's NEXT
  *     change (`lead`), with the latest row left open (null valid_to,
  *     `is_current = true`).
  *
  * Scale shape: partition-by-key windows parallelize across keys
  * (users/entities), the standard contract for per-stream history; no
  * state crosses a key, no self-join, no second exchange.
  */
object Scd2 {

  /** Build the SCD2 interval table for `trackCols` over the snapshot
    * log `df`. `orderCol` must be the event-time column; `tieCol`
    * breaks exact-timestamp ties deterministically (e.g. a monotonic
    * record id).
    *
    * Output: keyCol, tieCol (the id of the record that OPENED the
    * interval — the natural record-log lineage pointer, and a unique
    * sort key for consumers), trackCols*, valid_from, valid_to (null
    * while current), is_current.
    */
  def history(
      df: DataFrame, keyCol: String, orderCol: String, tieCol: String,
      trackCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieCol))
    // a row is a CHANGE if any tracked column differs from the
    // previous snapshot (null-safe: <=> treats null==null as equal).
    // Partition-boundary detection uses tieCol (a non-null record id):
    // lag(orderCol).isNull would also fire after a mid-partition null
    // event time, and null timestamp ordering differs between engines
    // (Spark nulls-first vs DuckDB nulls-last), so orderCol is not a
    // safe boundary probe (ADVICE r5).
    val changed = trackCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _) || lag(col(tieCol), 1).over(w).isNull
    val compacted = df
      .withColumn("_chg", changed)
      .filter(col("_chg"))
      .drop("_chg")
    // second window over the SAME spec → same exchange+sort reused
    val w2 = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieCol))
    compacted
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((Seq(col(keyCol), col(tieCol)) ++ trackCols.map(col)) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
