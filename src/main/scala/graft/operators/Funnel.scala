package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel and cohort retention — the two classic
  * event-stream analytics every product/ops pipeline runs, expressed
  * as entity-keyed aggregates (never a per-entity event sort):
  *
  * Funnel: an entity completes step k at the EARLIEST event of step
  * k's type that falls strictly after its step-(k−1) completion. Each
  * stage is one filtered equi-join against the (entity-bounded)
  * previous-stage frame plus a keyed min — the event log streams once
  * per step, no window, no per-entity sequence materialization.
  *
  * Retention: entities cohort by the epoch-week of their first event;
  * activity in week (cohort + offset) counts once per (entity, week).
  * Two keyed aggregates + one join; the output is (cohorts × offsets),
  * tiny at any corpus size.
  */
object Funnel {

  /** Per-step completion counts for `steps` in order. Emits
    * (step, step_type, n_entities), step 1-based. */
  def funnelCounts(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame =
    funnelCounts(events, keyCol, tsCol, typeCol, steps, None)

  /** As [[funnelCounts]], with an optional CONVERSION WINDOW: when
    * `maxSpanSeconds` is set, step k only counts if it lands within
    * the window of the step-1 completion — the "purchased within 7
    * days of signup" semantics; entities converting outside the
    * window are drop-off, not conversion. The funnel anchor time t1
    * rides each stage frame, so the window check stays one map-side
    * predicate per step. */
  def funnelCounts(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxSpanSeconds: Option[Long]): DataFrame = {
    require(steps.nonEmpty, "funnelCounts: need at least one step")
    var stage = events.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("t"))
      .withColumn("t1", col("t"))
    var out = stage.agg(count(lit(1)).as("n_entities"))
      .select(lit(1).as("step"), lit(steps.head).as("step_type"),
        col("n_entities"))
    for ((st, i) <- steps.tail.zipWithIndex) {
      val within = maxSpanSeconds.fold(lit(true))(w =>
        col(tsCol).cast("long") <= col("__t1").cast("long") + lit(w))
      stage = events.filter(col(typeCol) === st)
        .join(stage.select(col(keyCol), col("t").as("__tp"),
          col("t1").as("__t1")), Seq(keyCol))
        .where(col(tsCol) > col("__tp") && within)
        .groupBy(col(keyCol)).agg(min(col(tsCol)).as("t"),
          min(col("__t1")).as("t1"))
      out = out.unionByName(stage.agg(count(lit(1)).as("n_entities"))
        .select(lit(i + 2).as("step"), lit(st).as("step_type"),
          col("n_entities")))
    }
    out
  }

  /** Weekly cohort retention: (cohort_week, offset_weeks, n_active,
    * cohort_size, retention). Weeks are epoch-week integers
    * (floor(epoch/604800)) so the bucketing is engine-exact. */
  def cohortRetention(
      events: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val base = events.select(col(keyCol).as("k"),
      (col(tsCol).cast("long") / lit(604800L)).cast("long").as("wk"))
    val first = base.groupBy(col("k")).agg(min(col("wk")).as("cohort"))
    val sizes = first.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    base.join(first, Seq("k"))
      .select(col("cohort"), (col("wk") - col("cohort")).as("offset"),
        col("k"))
      .distinct()
      .groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort"))
      .withColumn("retention", round(
        col("n_active").cast("double") / col("cohort_size").cast("double"),
        6))
  }
}
