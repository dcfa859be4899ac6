package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable total-order id assignment.
  *
  * Training pipelines keep needing a stable consecutive row number —
  * shard manifests, curriculum order, resumable iteration — and the
  * naive `row_number() OVER (ORDER BY ...)` plans a SinglePartition
  * exchange: the entire dataset serializes through ONE task's sort,
  * which is exactly the shape that dies first at 100 TB.
  *
  * [[StableIds.assign]] is the classic two-phase replacement: the only
  * data-sized exchange hashes on a caller-supplied coarse bucket, the
  * cross-bucket coordination happens on bucket-COUNT rows (thousands,
  * not billions), and ids come out identical to the naive plan's.
  */
object StableIds {

  /** Assign consecutive global ids `1..N` in the total order
    * `(bucket, sortCols)`:
    *
    *  1. per-bucket row counts — one map-side-combined aggregate;
    *  2. exclusive prefix-sum of the counts over the bucket axis —
    *     a window over the AGGREGATED frame, so its SinglePartition
    *     sort touches #buckets rows, not the data;
    *  3. broadcast the offsets back and `row_number` within each
    *     bucket — one hash exchange on the bucket, per-bucket sorts
    *     run in parallel.
    *
    * Caller contract: `bucket` must be coarse-monotone in the sort
    * order — ordering by `(bucket, sortCols)` must equal ordering by
    * `sortCols` (e.g. `to_date(ts)` when sorting by `ts`). Bucket
    * granularity trades parallelism (more buckets) against offset-table
    * size; a date column on event data is the usual sweet spot. Skewed
    * buckets bound per-task sort size exactly like any keyed window —
    * AQE's skew handling does not split windows, so pick a bucket whose
    * largest member fits a task. */
  def assign(
      df: DataFrame,
      bucket: Column,
      sortCols: Seq[Column],
      idName: String = "stable_id"): DataFrame = {
    require(sortCols.nonEmpty, "assign: need at least one sort column")
    val withB = df.withColumn("__bucket", bucket)
    val counts = withB.groupBy(col("__bucket")).agg(count(lit(1)).as("__n"))
    val offsets = counts
      .withColumn("__off", coalesce(
        sum(col("__n")).over(Window.orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__bucket"), col("__off"))
    // null-SAFE equality on the bucket: a null bucket value (null ts
    // under to_date, say) groups and windows fine, but a plain equi
    // join would never match its offsets row and silently drop every
    // such input row — ids must cover ALL N rows (review r7). Nulls
    // sort first under Spark's ascending order, so the null bucket is
    // simply the first id block.
    withB.join(broadcast(offsets.withColumnRenamed("__bucket", "__rb")),
        col("__bucket") <=> col("__rb"))
      .withColumn(idName,
        col("__off") + row_number().over(
          Window.partitionBy(col("__bucket")).orderBy(sortCols: _*)))
      .drop("__bucket", "__rb", "__off")
  }

  /** The tile `ntile(tiles)` would assign to 1-based rank `k` of `n`
    * total rows — Spark/ANSI semantics exactly: `n = tiles·q + r`
    * splits into `r` leading tiles of `q+1` rows and `tiles−r` of `q`
    * rows. With `k` from [[assign]] this replaces the global
    * `ntile() OVER (ORDER BY …)` window — the SinglePartition sort
    * over the full frame — with pure map-side arithmetic, yielding
    * bit-identical tiles (VERDICT r9 #3, the q_rfm fix). Divisions
    * run floor-over-double — exact below 2⁵³ rows, i.e. any
    * materializable frame. */
  def ntileFromRank(k: Column, n: Column, tiles: Int): Column = {
    require(tiles >= 1, s"ntileFromRank: tiles=$tiles")
    def fdiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val q = fdiv(n, lit(tiles.toLong))
    val r = n % tiles
    val boundary = r * (q + lit(1L))
    // q == 0 (fewer rows than tiles) keeps every k in the first
    // branch (boundary = n), so the else-branch q division is safe
    when(k <= boundary, fdiv(k + q, q + lit(1L)))
      .otherwise(r + fdiv(k - boundary + q - lit(1L), q))
  }
}
