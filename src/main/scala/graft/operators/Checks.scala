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

  /** DISTINCTNESS: count-distinct / count — 1.0 iff no value repeats.
    * (Deequ's Uniqueness — the fraction of values occurring exactly
    * once — is a different metric that needs a two-level aggregate and
    * cannot ride this single pass; on [1,1,2] distinctness is 2/3
    * while uniqueness is 1/3. This check catches ANY duplication via
    * threshold=1.0, but sub-1.0 thresholds measure distinct RATIO,
    * not once-only rows.) Exact by default; swap countDistinct for
    * approx_count_distinct at the 100 TB end — same shape, documented
    * error. */
  def distinctness(name: String, c: Column, threshold: Double = 1.0): Check =
    Check(name, try_divide(countDistinct(c).cast("double"), count(lit(1))), threshold)

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
    * gate because no rows disproved it. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Checks.run: no checks declared")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      round(c.rate, 6).as(s"__m$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(i).cast("long").as("ord"), lit(c.name).as("check"),
        col(s"__m$i").as("metric"), lit(c.threshold).as("threshold"),
        coalesce(col(s"__m$i") >= c.threshold, lit(false)).as("passed"))
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
      .agg(round(try_divide(
        sum(col("__pk").isNotNull.cast("long")).cast("double"), count(lit(1))),
        6).as("metric"))
    hit.select(lit(Long.MaxValue).as("ord"), lit(name).as("check"),
      col("metric"), lit(threshold).as("threshold"),
      coalesce(col("metric") >= threshold, lit(false)).as("passed"))
  }
}
