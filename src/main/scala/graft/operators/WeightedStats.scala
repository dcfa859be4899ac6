package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Exact weighted quantiles without windowing the raw stream.
  *
  * The textbook exact weighted median — cumulative weight over a
  * per-group total value order, pick the first row crossing half the
  * mass — funnels EVERY group row through one window task; with a
  * handful of groups (return flags, languages) that is the
  * single-partition sort the plan audits keep flagging. This operator
  * two-phases it: a bucket histogram (group × bucket keyed aggregate,
  * map-side combine) locates the bucket containing the crossing point
  * from bucket-count-sized running sums, and only THAT bucket's rows
  * pay a window — bounded by one bucket's occupancy, dialed by
  * `bucketWidth`, not by group size.
  *
  * Determinism: weights accumulate as exact decimals, buckets are
  * integer floors, and the in-bucket order carries explicit tie-break
  * columns — the crossing row (and so the median) is a pure function
  * of the data on any engine.
  *
  * Weight quantization: weights pass through DECIMAL(18,6) — exact
  * for integral and 6-dp weights (quantities, counts, per-mille
  * importance weights); finer-grained fractions (a DSIR weight of
  * 1e-8, say) round HALF_UP at the 6th decimal place before
  * accumulating, which can shift the crossing point by the rounded
  * mass. Pre-scale such weights into ≥1e-6 units before calling
  * (ADVICE r9). */
object WeightedStats {

  /** Exact weighted median of `valueCol` under `weightCol` per
    * `groupCol`: the smallest value v such that the cumulative weight
    * of rows ≤ v (in (value, tieBreak…) order) reaches half the
    * group's total. Emits (group, wmedian, total_w). */
  def weightedMedian(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      weightCol: String,
      bucketWidth: Double,
      tieBreak: Seq[String]): DataFrame =
    weightedQuantile(df, groupCol, valueCol, weightCol, bucketWidth,
      tieBreak, 1, 2)
      .withColumnRenamed("wquantile", "wmedian")

  /** General exact weighted quantile at the RATIONAL probability
    * pNum/pDen (1/2 = median, 9/10 = p90 …): the smallest value whose
    * cumulative weight reaches p·total, under the same two-phase
    * bucket-histogram plan as [[weightedMedian]] — the crossing
    * comparison `cum·pDen ≥ tot·pNum` stays in exact decimal×integer
    * arithmetic, so no float probability ever enters the decision. */
  def weightedQuantile(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      weightCol: String,
      bucketWidth: Double,
      tieBreak: Seq[String],
      pNum: Int,
      pDen: Int): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth")
    require(pDen > 0 && pNum > 0 && pNum <= pDen, s"p=$pNum/$pDen")
    val w = col(weightCol).cast(DecimalType(18, 6))
    val base = df.select(
      (col(groupCol).as("g") +:
        col(valueCol).as("v") +:
        w.as("w") +:
        tieBreak.map(col)): _*)
      .withColumn("bucket",
        floor(col("v") / lit(bucketWidth)).cast("long"))
    // phase 1: per-bucket mass, running mass over the SMALL bucket table
    val hist = base.groupBy(col("g"), col("bucket"))
      .agg(sum(col("w")).as("bw"))
    val totals = hist.groupBy(col("g")).agg(sum(col("bw")).as("tot"))
    val running = hist
      .withColumn("cum", sum(col("bw")).over(
        Window.partitionBy(col("g")).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(totals, Seq("g"))
    val medBucket = running
      .where(col("cum") * pDen >= col("tot") * pNum)
      .groupBy(col("g"))
      .agg(min(struct(col("bucket"), col("cum"), col("bw"), col("tot")))
        .as("m"))
      .select(col("g"), col("m.bucket").as("bucket"),
        (col("m.cum") - col("m.bw")).as("below"), col("m.tot").as("tot"))
    // phase 2: window ONLY the crossing bucket's rows
    val inBucket = base.join(medBucket, Seq("g", "bucket"))
    val ord = Window.partitionBy(col("g"))
      .orderBy((col("v") +: tieBreak.map(col)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    inBucket
      .withColumn("cum2", sum(col("w")).over(ord))
      .where((col("below") + col("cum2")) * pDen >= col("tot") * pNum)
      .groupBy(col("g"))
      .agg(min(col("v")).as("wq"),
        max(col("tot")).as("__t"))
      .select(col("g").as(groupCol), round(col("wq"), 6).as("wquantile"),
        col("__t").cast(DoubleType).as("total_w"))
  }
}
