package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-bucketed interval (range) join. Spark has no native range-join
  * strategy: a raw `l.ts BETWEEN r.start AND r.end` predicate (with or
  * without an equi-key) plans as a nested-loop over every candidate
  * row pair — O(|L|·|R|) per equi-group, the classic scale killer on
  * "events within a window" joins. Binning restores an equi-join:
  * each point maps to exactly one time bin, each interval explodes to
  * the bins it covers, the join runs on (equiKeys…, bin) through the
  * ordinary shuffled/broadcast hash-join machinery, and the original
  * range predicate remains only as a residual filter over candidates
  * that already share a bin.
  *
  * Each matching (point, interval) pair shares exactly ONE bin — the
  * point's — so the output needs no dedup. `binWidth` is the
  * replication dial: an interval spans ⌈len/binWidth⌉ bins, so size it
  * near the typical interval length (replication ≈ 2×) and let AQE
  * handle residual skew. All arithmetic is in whole long units
  * (epoch seconds for time), fully engine-reproducible.
  */
object RangeJoin {

  /** Join each left row's point `pointCol` (long) to right rows whose
    * [startCol, endCol) interval contains it, both sides also matched
    * on `equiKeys`. Inclusive start, exclusive end — the convention
    * that makes adjacent windows partition cleanly. */
  def pointInInterval(
      left: DataFrame, right: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      equiKeys: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth")
    // floor-division via double is exact for |value| < 2^53 — epoch
    // seconds are ~2^31; callers with larger domains should pre-scale.
    def bin(c: Column): Column = floor(c.cast("double") / binWidth).cast("long")
    val l = left.withColumn("__bin", bin(col(pointCol)))
    // end < start would make sequence() DESCEND and explode a bin list
    // proportional to the (nonsensical) gap; such intervals can match
    // nothing, so drop them before the explode.
    val r = right.where(col(endCol) >= col(startCol)).withColumn("__bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    l.join(r, equiKeys :+ "__bin")
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }
}
