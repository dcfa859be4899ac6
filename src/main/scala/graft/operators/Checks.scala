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
    Check(name, count(c).cast("double") / count(lit(1)), threshold)

  /** Fraction of rows whose key is unique (count-distinct / count).
    * Exact by default; swap the expression for approx_count_distinct
    * at the 100 TB end — same output shape, documented error. */
  def unique(name: String, c: Column, threshold: Double = 1.0): Check =
    Check(name, countDistinct(c).cast("double") / count(lit(1)), threshold)

  /** Fraction of non-null values inside [lo, hi]. */
  def inRange(name: String, c: Column, lo: Double, hi: Double,
      threshold: Double = 1.0): Check =
    Check(name,
      sum(when(c.isNotNull && c >= lo && c <= hi, 1L).otherwise(0L))
        .cast("double") / count(c),
      threshold)

  /** Fraction of rows satisfying an arbitrary row predicate. */
  def satisfies(name: String, pred: Column, threshold: Double = 1.0): Check =
    Check(name, sum(pred.cast("long")).cast("double") / count(lit(1)), threshold)

  /** Run all metric checks in ONE aggregate pass over `df`.
    * Output columns: check (string), metric (double, round-6),
    * threshold (double), passed (boolean); rows in declaration order
    * via an explicit ordinal so the report is deterministic. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Checks.run: no checks declared")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      round(c.rate, 6).as(s"__m$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(i).cast("long").as("ord"), lit(c.name).as("check"),
        col(s"__m$i").as("metric"), lit(c.threshold).as("threshold"),
        (col(s"__m$i") >= c.threshold).as("passed"))
    }
    wide.select(explode(array(rows: _*)).as("r"))
      .select(col("r.ord"), col("r.check"), col("r.metric"),
        col("r.threshold"), col("r.passed"))
  }

  /** Referential integrity: fraction of non-null `fk` values present
    * in `dim`'s `pk` column. Joins only the DISTINCT fk keys against
    * the DISTINCT dimension keys — at 100 TB neither the fact rows nor
    * the dimension payload ever shuffle, only keys. Returns the same
    * report row shape as [[run]] (ord = Long.MaxValue sorts it last). */
  def refIntegrity(df: DataFrame, fk: Column, dim: DataFrame, pk: Column,
      name: String, threshold: Double = 1.0): DataFrame = {
    val fks = df.select(fk.as("__fk")).filter(col("__fk").isNotNull)
    val keys = dim.select(pk.as("__pk")).distinct()
    val hit = fks.join(broadcast(keys), col("__fk") === col("__pk"), "left")
      .agg(round(
        sum(col("__pk").isNotNull.cast("long")).cast("double") / count(lit(1)),
        6).as("metric"))
    hit.select(lit(Long.MaxValue).as("ord"), lit(name).as("check"),
      col("metric"), lit(threshold).as("threshold"),
      (col("metric") >= threshold).as("passed"))
  }
}
