package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the expectations gate a pipeline
  * runs before trusting (or publishing) a table: completeness,
  * uniqueness, domain ranges, referential integrity. The public
  * "unit tests for data" shape (cf. Deequ / Great Expectations),
  * re-expressed as Spark aggregates.
  *
  * Every metric-style check compiles to ONE aggregate over the table —
  * a single scan and a single exchange of partial states however many
  * checks run (the same one-pass property as [[Profile]]); referential
  * integrity is the one check that needs a second input and joins
  * against the dimension's (distinct) keys — broadcast-sized for real
  * dimensions, and only key columns ever move.
  *
  * Output: one row per check — (check, metric, threshold, passed) —
  * with the metric a rate in [0, 1] rounded to 6 dp so the report
  * replays engine-exactly.
  */
object Checks {

  /** One declarative check: `rate` is an aggregate Column producing a
    * [0,1] rate; the check passes when rate >= threshold. */
  final case class Check(name: String, rate: Column, threshold: Double)

  /** Fraction of rows with `c` non-null. */
  def complete(name: String, c: Column, threshold: Double = 1.0): Check =
    Check(name, try_divide(count(c).cast("double"), count(lit(1))), threshold)

  /** DISTINCTNESS: count-distinct / count-non-null — 1.0 iff no
    * non-null value repeats. Both sides of the ratio exclude nulls
    * (countDistinct already does; the denominator is count(c) to
    * match), so missing values are [[complete]]'s concern, not this
    * check's — a fully-distinct column plus one null still scores 1.0
    * (ADVICE r6). (Deequ's Uniqueness — the fraction of values
    * occurring exactly once — is a different metric that needs a
    * two-level aggregate and cannot ride this single pass; see
    * [[uniqueness]]. On [1,1,2] distinctness is 2/3 while uniqueness
    * is 1/3.) Exact by default; swap countDistinct for
    * approx_count_distinct at the 100 TB end — same shape, documented
    * error. */
  def distinctness(name: String, c: Column, threshold: Double = 1.0): Check =
    Check(name, try_divide(countDistinct(c).cast("double"), count(c)), threshold)

  /** Fraction of non-null values inside [lo, hi]. */
  def inRange(name: String, c: Column, lo: Double, hi: Double,
      threshold: Double = 1.0): Check =
    Check(name,
      try_divide(
        sum(when(c.isNotNull && c >= lo && c <= hi, 1L).otherwise(0L))
          .cast("double"), count(c)),
      threshold)

  /** Fraction of rows satisfying an arbitrary row predicate. */
  def satisfies(name: String, pred: Column, threshold: Double = 1.0): Check =
    Check(name, try_divide(sum(pred.cast("long")).cast("double"), count(lit(1))), threshold)

  /** Run all metric checks in ONE aggregate pass over `df`.
    * Output columns: check (string), metric (double, round-6),
    * threshold (double), passed (boolean); rows in declaration order
    * via an explicit ordinal so the report is deterministic.
    *
    * VACUOUS INPUTS FAIL: a 0/0 rate (empty table; all-null column
    * under [[inRange]]) is a null metric, and `passed` coalesces null
    * to FALSE — the worst possible input must not sail through the
    * gate because no rows disproved it.
    *
    * The verdict uses the UNROUNDED rate: at large row counts a rate
    * like 0.99999995 rounds to 1.0, and a threshold=1.0 gate judged on
    * the rounded metric would let up to ~5e-8 violating rows through
    * (ADVICE r6). The round-6 metric column stays — it is only the
    * engine-exact REPORT value, never the verdict input. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Checks.run: no checks declared")
    val aggs = checks.zipWithIndex.flatMap { case (c, i) =>
      Seq(round(c.rate, 6).as(s"__m$i"), c.rate.as(s"__r$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(i).cast("long").as("ord"), lit(c.name).as("check"),
        col(s"__m$i").as("metric"), lit(c.threshold).as("threshold"),
        coalesce(col(s"__r$i") >= c.threshold, lit(false)).as("passed"))
    }
    wide.select(explode(array(rows: _*)).as("r"))
      .select(col("r.ord"), col("r.check"), col("r.metric"),
        col("r.threshold"), col("r.passed"))
  }

  /** Enforced bound on [[refIntegrity]]'s broadcast dimension-key side:
    * past ~10⁷ distinct keys the broadcast stops fitting executor
    * memory and the right plan is a plain (shuffled) left join — the
    * same fail-fast posture as Similarity.MaxBroadcastQueries. */
  val MaxBroadcastDimKeys: Int = 10000000

  /** Referential integrity: fraction of non-null fk ROWS (row-weighted
    * — each fact row counts once, so a hot dangling key is weighted by
    * its row count) whose value is present in `dim`'s `pk` column.
    * Only key columns move: the fact side projects to its fk, the
    * dimension to its DISTINCT pk (broadcast, with an enforced
    * fail-fast bound). Returns the same report row shape as [[run]]
    * (ord = Long.MaxValue sorts it last); an all-null fk column is the
    * vacuous case and fails like [[run]]'s. */
  def refIntegrity(df: DataFrame, fk: Column, dim: DataFrame, pk: Column,
      name: String, threshold: Double = 1.0,
      maxDimKeys: Int = MaxBroadcastDimKeys): DataFrame = {
    val fks = df.select(fk.as("__fk")).filter(col("__fk").isNotNull)
    val keys = dim.select(pk.as("__pk")).distinct()
    val nKeys = keys.limit(maxDimKeys + 1).count()
    require(nKeys <= maxDimKeys,
      s"refIntegrity: dimension exceeds $maxDimKeys distinct keys — a " +
        "broadcast this size is an executor-memory killer; use a plain join")
    val hit = fks.join(broadcast(keys), col("__fk") === col("__pk"), "left")
      .agg(try_divide(
        sum(col("__pk").isNotNull.cast("long")).cast("double"), count(lit(1)))
        .as("__rate"))
    hit.select(lit(Long.MaxValue).as("ord"), lit(name).as("check"),
      round(col("__rate"), 6).as("metric"), lit(threshold).as("threshold"),
      coalesce(col("__rate") >= threshold, lit(false)).as("passed"))
  }

  /** UNIQUENESS (Deequ's metric): the fraction of non-null ROWS whose
    * value occurs exactly once — on [1,1,2] uniqueness is 1/3 where
    * [[distinctness]] is 2/3. Needs a two-level aggregate (per-value
    * counts, then the fraction with count==1), so it cannot ride
    * [[run]]'s single pass; it returns the same report-row shape
    * instead (cf. [[refIntegrity]]). Two exchanges of key-sized
    * partial states — map-side partial counts make the first pass
    * |distinct values|, not |rows|. Nulls are excluded from both
    * sides of the ratio (missingness is [[complete]]'s concern); an
    * empty/all-null column is the vacuous case and fails like
    * [[run]]'s. Verdict from the unrounded rate, report round-6. */
  def uniqueness(df: DataFrame, c: Column, name: String,
      threshold: Double = 1.0, ord: Long = Long.MaxValue - 1): DataFrame = {
    val counts = df.select(c.as("__v")).filter(col("__v").isNotNull)
      .groupBy(col("__v")).agg(count(lit(1)).as("__n"))
    val rate = counts.agg(try_divide(
      sum(when(col("__n") === 1, 1L).otherwise(0L)).cast("double"),
      sum(col("__n"))).as("__rate"))
    rate.select(lit(ord).as("ord"), lit(name).as("check"),
      round(col("__rate"), 6).as("metric"), lit(threshold).as("threshold"),
      coalesce(col("__rate") >= threshold, lit(false)).as("passed"))
  }
}
