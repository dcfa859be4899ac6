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

  /** Per-PARTITION consecutive ranks `1..n_part` in the order
    * `(bucket, sortCols)` within each `partCols` group — the two-phase
    * replacement for `row_number() OVER (PARTITION BY low-card-key
    * ORDER BY …)`, which funnels each partition's ENTIRE slice through
    * one task (a 5-source corpus = 5 tasks sorting 20 TB each; the
    * r10 plan audit found four declared queries in this shape). Same
    * machinery as [[assign]], with the offsets prefix-sum windowed PER
    * PARTITION over the (partitions × buckets)-sized count frame, so
    * cross-bucket coordination still never touches data-sized rows.
    *
    * `partCountName`, when set, adds each partition's total row count
    * — the companion [[ntileFromRank]]/percent-rank denominators need.
    * Caller contract matches [[assign]]: `bucket` coarse-monotone in
    * the within-partition sort order; partitions × buckets bounded
    * (the offsets frame is broadcast). */
  def assignPartitioned(
      df: DataFrame,
      partCols: Seq[String],
      bucket: Column,
      sortCols: Seq[Column],
      idName: String,
      partCountName: Option[String] = None): DataFrame = {
    require(partCols.nonEmpty, "assignPartitioned: need partition columns")
    require(sortCols.nonEmpty, "assignPartitioned: need sort columns")
    val withB = df.withColumn("__bucket", bucket)
    val counts = withB
      .groupBy((partCols.map(col) :+ col("__bucket")): _*)
      .agg(count(lit(1)).as("__n"))
    val wOff = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("__bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets0 = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
    // partition totals via a second tiny aggregate + join (NOT an
    // orderless window — the plan gates pin every window here to a
    // __bucket key)
    val offsets = partCountName.fold(offsets0) { cn =>
      // null-safe: a NULL partition value groups fine but would never
      // match through a using-columns join, silently dropping every
      // such row downstream
      val totals = partCols.foldLeft(
        counts.groupBy(partCols.map(col): _*).agg(sum(col("__n")).as(cn))) {
        (acc, c) => acc.withColumnRenamed(c, s"__t_$c")
      }
      offsets0.join(totals,
          partCols.map(c => col(c) <=> col(s"__t_$c")).reduce(_ && _))
        .drop(partCols.map(c => s"__t_$c"): _*)
    }
    val joinKeys = partCols :+ "__bucket"
    val renamed = joinKeys.foldLeft(offsets.drop("__n")) {
      (acc, c) => acc.withColumnRenamed(c, s"__r_$c")
    }
    val cond = joinKeys.map(c => col(c) <=> col(s"__r_$c")).reduce(_ && _)
    withB.join(broadcast(renamed), cond)
      .withColumn(idName, col("__off") + row_number().over(
        Window.partitionBy((partCols.map(col) :+ col("__bucket")): _*)
          .orderBy(sortCols: _*)))
      .drop((Seq("__bucket", "__off") ++ joinKeys.map(c => s"__r_$c")): _*)
  }

  /** Per-partition RUNNING SUM of `value` in the order
    * `(bucket, sortCols)` — the two-phase replacement for
    * `sum(v) OVER (PARTITION BY low-card-key ORDER BY … ROWS UNBOUNDED
    * PRECEDING)`: per-bucket sums aggregate map-side, the exclusive
    * bucket prefix-sum runs over the tiny count frame, and each row
    * adds its within-bucket running sum — identical to the window's
    * sequence, no partition-sized task. `partTotalName`, when set,
    * adds the partition's total (the head-mass / normalization
    * denominator). Caller contract as [[assignPartitioned]]; `value`
    * should be an exact type (long/decimal) — it is summed. */
  def prefixSumPartitioned(
      df: DataFrame,
      partCols: Seq[String],
      bucket: Column,
      sortCols: Seq[Column],
      value: Column,
      cumName: String,
      partTotalName: Option[String] = None): DataFrame = {
    require(partCols.nonEmpty, "prefixSumPartitioned: need partition columns")
    require(sortCols.nonEmpty, "prefixSumPartitioned: need sort columns")
    val withB = df.withColumn("__bucket", bucket).withColumn("__v", value)
    val sums = withB
      .groupBy((partCols.map(col) :+ col("__bucket")): _*)
      .agg(sum(col("__v")).as("__s"))
    val wOff = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("__bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets0 = sums.withColumn("__off",
      coalesce(sum(col("__s")).over(wOff), lit(0L)))
    val offsets = partTotalName.fold(offsets0) { cn =>
      // null-safe join, as in assignPartitioned
      val totals = partCols.foldLeft(
        sums.groupBy(partCols.map(col): _*).agg(sum(col("__s")).as(cn))) {
        (acc, c) => acc.withColumnRenamed(c, s"__t_$c")
      }
      offsets0.join(totals,
          partCols.map(c => col(c) <=> col(s"__t_$c")).reduce(_ && _))
        .drop(partCols.map(c => s"__t_$c"): _*)
    }
    val joinKeys = partCols :+ "__bucket"
    val renamed = joinKeys.foldLeft(offsets.drop("__s")) {
      (acc, c) => acc.withColumnRenamed(c, s"__r_$c")
    }
    val cond = joinKeys.map(c => col(c) <=> col(s"__r_$c")).reduce(_ && _)
    withB.join(broadcast(renamed), cond)
      .withColumn(cumName, col("__off") +
        sum(col("__v")).over(
          Window.partitionBy((partCols.map(col) :+ col("__bucket")): _*)
            .orderBy(sortCols: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop((Seq("__bucket", "__v", "__off") ++
        joinKeys.map(c => s"__r_$c")): _*)
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
