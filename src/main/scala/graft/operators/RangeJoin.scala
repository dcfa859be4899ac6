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

  /** Interval×interval OVERLAP join (r10): left [lStart, lEnd) rows
    * matched to right [rStart, rEnd) rows sharing `equiKeys` whose
    * spans intersect — the sessions×campaigns / downtime×jobs shape a
    * raw `ls < re AND rs < le` theta-join would plan as a nested loop.
    * Both sides explode to their covered bins and meet in an ordinary
    * equi-join on (keys…, bin); the residual overlap predicate prunes
    * within-bin non-matches.
    *
    * Exactly-once emission WITHOUT a distinct: an overlapping pair
    * shares every bin their intersection covers, so the join keeps a
    * pair only in its CANONICAL bin — the bin of the intersection's
    * start `max(lStart, rStart)`, which both intervals cover by
    * definition. No dedup exchange, no double counting.
    *
    * Same scale dial as [[pointInInterval]]: an interval spans
    * ⌈len/binWidth⌉ bins, so pick binWidth near the typical interval
    * length; degenerate/empty intervals (end ≤ start under the
    * half-open convention) match nothing and are dropped before the
    * explode. */
  def intervalOverlap(
      left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      equiKeys: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth")
    def bin(c: Column): Column = floor(c.cast("double") / binWidth).cast("long")
    // Last covered bin of the REAL half-open interval is
    // ceil(end/binWidth) − 1, not bin(end − 1) (ADVICE r10): bin()
    // accepts fractional bounds, and bin(end − 1) under-covers any
    // sub-unit overhang — [19.5, 20.3) at binWidth 10 would explode
    // only bin 1 and silently drop overlaps whose intersection starts
    // in bin 2. ceil(end/W) − 1 agrees with bin(end − 1) on integral
    // bounds and is exact for fractional ones; end > start guarantees
    // it is ≥ bin(start), so sequence() never runs descending.
    def lastBin(c: Column): Column =
      (ceil(c.cast("double") / binWidth) - 1).cast("long")
    val l = left.where(col(lEnd) > col(lStart)).withColumn("__bin",
      explode(sequence(bin(col(lStart)), lastBin(col(lEnd)))))
    val r = right.where(col(rEnd) > col(rStart)).withColumn("__bin",
      explode(sequence(bin(col(rStart)), lastBin(col(rEnd)))))
    l.join(r, equiKeys :+ "__bin")
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        col("__bin") === bin(greatest(col(lStart), col(rStart))))
      .drop("__bin")
  }
}
