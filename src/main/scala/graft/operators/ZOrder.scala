package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * Parquet min/max pruning works on ONE sort order: a log clustered by
  * `user_id` skips nothing for a `value` predicate. Interleaving the
  * bits of several normalized dimensions into one Morton key and
  * range-partitioning + sorting on it gives every dimension locality —
  * a file then covers a small hyper-rectangle of the space, so min/max
  * stats prune selective predicates on ANY of the interleaved columns.
  * This is the standard lakehouse `ZORDER BY` layout trick, built here
  * from plain integer column arithmetic so it stays inside whole-stage
  * codegen and is replayable bit-for-bit in any engine.
  *
  * The bit-spread uses the classic mask-and-shift doubling scheme
  * (public "Bit Twiddling Hacks" / libmorton formulation): 16 bits per
  * dimension, so a 2-d key fits in 32 bits and a 3-d key in 48 — a
  * Spark LongType either way. Normalization to the 16-bit grid is
  * fixed-point min/max scaling; min/max come from one tiny aggregate
  * broadcast back (never a driver collect).
  */
object ZOrder {

  private val Bits = 16
  private val MaxCell = (1 << Bits) - 1 // 65535

  /** Spread the low 16 bits of `x`, leaving one gap bit between
    * consecutive payload bits (2-d interleave). Masks are the standard
    * Part1By1 doubling sequence widened to long. */
  private def spread2(x: Column): Column = {
    val s0 = x.bitwiseAND(lit(0xFFFFL))
    val s1 = (s0.bitwiseOR(shiftleft(s0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Spread with two gap bits (3-d interleave) — Part1By2 masks,
    * derived for a 16-bit payload in a 48-bit result: after each step
    * the payload chunks (bytes → nibbles → bit-pairs → bits) sit at
    * 3× their in-chunk stride. */
  private def spread3(x: Column): Column = {
    val s0 = x.bitwiseAND(lit(0xFFFFL))
    val s1 = (s0.bitwiseOR(shiftleft(s0, 16))).bitwiseAND(lit(0xFF0000FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 8))).bitwiseAND(lit(0xF00F00F00FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 4))).bitwiseAND(lit(0xC30C30C30C3L))
    (s3.bitwiseOR(shiftleft(s3, 2))).bitwiseAND(lit(0x249249249249L))
  }

  /** Fixed-point normalization of `v` onto the 16-bit grid given its
    * min/max: `floor((v - min) / (max - min) * 65535)`. IEEE division
    * and multiplication are correctly rounded, so the cell index is
    * bit-identical across engines. A constant column (max == min)
    * lands every row in cell 0. */
  def cell(v: Column, vMin: Column, vMax: Column): Column =
    when(vMax <=> vMin, lit(0L)).otherwise(
      floor((v.cast("double") - vMin) / (vMax - vMin) * MaxCell)
        .cast("long"))

  /** The Morton key of 2 or 3 pre-normalized 16-bit cell columns. */
  def mortonKey(cells: Seq[Column]): Column = cells match {
    case Seq(a, b) => spread2(a).bitwiseOR(shiftleft(spread2(b), 1))
    case Seq(a, b, c) =>
      spread3(a).bitwiseOR(shiftleft(spread3(b), 1))
        .bitwiseOR(shiftleft(spread3(c), 2))
    case _ => throw new IllegalArgumentException(
      s"mortonKey interleaves 2 or 3 dimensions, got ${cells.length}")
  }

  /** Append a `z` Morton-key column over `dims`, normalizing each
    * dimension by its observed min/max (one aggregate row, broadcast
    * back — the scan-sized input crosses no extra exchange). */
  def withKey(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.length == 2 || dims.length == 3,
      s"z-order interleaves 2 or 3 dimensions, got ${dims.length}")
    val boundCols = dims.zipWithIndex.flatMap { case (d, i) => Seq(
      min(col(d).cast("double")).as(s"__min$i"),
      max(col(d).cast("double")).as(s"__max$i")) }
    val bounds = df.agg(boundCols.head, boundCols.tail: _*)
    val joined = df.crossJoin(broadcast(bounds))
    val cells = dims.zipWithIndex.map { case (d, i) =>
      cell(col(d), col(s"__min$i"), col(s"__max$i")) }
    joined.withColumn("z", mortonKey(cells))
      .drop(dims.indices.flatMap(i => Seq(s"__min$i", s"__max$i")): _*)
  }

  /** Cluster the frame for writing: range-partition on the Morton key
    * (`numFiles` output files ≈ `numFiles` hyper-rectangles) and sort
    * inside each so parquet row-group stats are tight on every
    * interleaved dimension. */
  def cluster(df: DataFrame, dims: Seq[String], numFiles: Int): DataFrame =
    withKey(df, dims)
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions(col("z"))
}
