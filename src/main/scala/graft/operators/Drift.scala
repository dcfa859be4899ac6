package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two snapshots of a feature —
  * the monitoring pass a feature store runs when a new data drop lands
  * (reference scope: `feature_store.py`'s statistics() is the
  * single-snapshot half of this; drift is its two-snapshot extension,
  * cf. the PSI / population-stability practice in feature monitoring).
  *
  * Binning is fit on the REFERENCE window only (equal-width over the
  * reference min/max in scaled-integer space, the [[Profile.histogram]]
  * idiom), and the current window is clamped into those bins — so the
  * comparison is leak-free: the current distribution never moves the
  * bin edges it is judged against.
  *
  * Every oracled statistic is computed in EXACT integer arithmetic.
  * With Laplace-smoothed proportions p_b = (c_b + 1) / (n + B) the
  * per-bin gap is
  *
  *   |p_ref − p_cur| = |(cr+1)·(nc+B) − (cc+1)·(nr+B)| / ((nr+B)·(nc+B))
  *
  * whose numerator is an exact BIGINT — summed order-free — and whose
  * denominator is a per-key constant applied once at the edge, so TVD
  * and worst-gap replay bit-identically in DuckDB. (Bounds: the
  * numerator sum is ≤ 2·B·(nr+B)·(nc+B); at 10⁹ rows/key and B=10 that
  * is ~10¹⁹ — beyond that, pre-aggregate per day or drop to per-shard
  * drift.) PSI (which needs a libm `ln`, not cross-engine
  * reproducible) is emitted as a convenience column for monitoring and
  * spec-checked in Scala; the oracled query projects it away.
  */
object Drift {

  /** Per-key drift report between `ref` and `cur`:
    * (key, n_ref, n_cur, lo, hi, tvd, worst_gap, psi), ordered by key.
    *
    * `lo`/`hi` are the reference min/max in scaled-integer units
    * (value·10^scale, rounded); `tvd` is the total-variation distance
    * and `worst_gap` the largest single-bin gap of the Laplace-
    * smoothed binned distributions; `psi` is the population stability
    * index over the same smoothed bins (spec-only, see scaladoc).
    * Keys present in only one window are dropped (no reference edges
    * to judge against / nothing to compare).
    */
  def histogramDrift(ref: DataFrame, cur: DataFrame, keyCol: String,
      valueCol: String, nBins: Int, scale: Int = 2): DataFrame = {
    require(nBins >= 2 && nBins <= 10000, s"histogramDrift: nBins=$nBins")
    val mult = math.pow(10.0, scale)
    def sv(c: Column): Column = round(c * mult).cast("long")
    val k = col(keyCol)

    val refS = ref.filter(col(valueCol).isNotNull)
      .select(k.as("key"), sv(col(valueCol)).as("sv"))
    val curS = cur.filter(col(valueCol).isNotNull)
      .select(k.as("key"), sv(col(valueCol)).as("sv"))

    // reference edges: one tiny row per key — broadcast back over both
    // fact scans, so binning is map-side
    val edges = refS.groupBy(col("key")).agg(
        min(col("sv")).as("lo"), max(col("sv")).as("hi"),
        count(lit(1)).as("n_ref"))
      .localCheckpoint(false) // feeds three parents (see q_source_mix)

    // clamp-then-divide: clamped sv is in [lo, hi], so the division
    // lands in [0, nBins-1] with no post-clamp needed. The division
    // runs in DOUBLE with an explicit floor on both engines (a bare
    // long/long is true-division in Spark but floor-division in
    // DuckDB, and cast-to-bigint truncates in Spark but rounds in
    // DuckDB — floor(double/double) is the one spelling that agrees);
    // exactness holds while (hi−lo)·nBins < 2⁵³, far beyond any
    // fixed-point feature range worth binning.
    def binOf(svc: Column): Column = {
      val c = least(greatest(svc, col("lo")), col("hi"))
      floor((c - col("lo")).cast("double") * nBins /
        (col("hi") - col("lo") + 1).cast("double")).cast("long")
    }

    def binned(side: DataFrame, cName: String): DataFrame =
      side.join(broadcast(edges.select(col("key"), col("lo"), col("hi"))), "key")
        .select(col("key"), binOf(col("sv")).as("bin"))
        .groupBy(col("key"), col("bin")).agg(count(lit(1)).as(cName))

    val refC = binned(refS, "cr")
    val curC = binned(curS, "cc")

    // every (key, bin) cell must exist — empty bins still carry
    // smoothed mass 1/(n+B). The scaffold is keys × nBins (tiny).
    // n_cur needs no third scan of the current side: clamping drops no
    // row and nulls are filtered upstream, so the per-key sum of the
    // binned counts IS the row count — a window over the tiny cell
    // frame. Keys absent from cur (n_cur = 0) are dropped to mirror
    // the ref-absent side (nothing to compare).
    val cells = edges.select(col("key"),
        explode(sequence(lit(0), lit(nBins - 1))).as("bin"))
      .join(refC, Seq("key", "bin"), "left")
      .join(curC, Seq("key", "bin"), "left")
      .na.fill(0L, Seq("cr", "cc"))
      .join(broadcast(edges), "key")
      .withColumn("n_cur", sum(col("cc")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("key"))))
      .filter(col("n_cur") > 0)

    val dr = col("n_ref") + nBins // smoothed denominators
    val dc = col("n_cur") + nBins
    val num = abs((col("cr") + 1) * dc - (col("cc") + 1) * dr)
    val pRef = (col("cr") + 1).cast("double") / dr.cast("double")
    val pCur = (col("cc") + 1).cast("double") / dc.cast("double")

    cells
      .withColumn("num", num)
      .withColumn("psi_term", (pCur - pRef) * log(pCur / pRef))
      .groupBy(col("key"))
      .agg(
        first(col("n_ref")).as("n_ref"), first(col("n_cur")).as("n_cur"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"),
        sum(col("num")).as("sum_num"), max(col("num")).as("max_num"),
        sum(col("psi_term")).as("psi_raw"))
      .select(col("key").as(keyCol), col("n_ref"), col("n_cur"),
        col("lo"), col("hi"),
        round(col("sum_num").cast("double") /
          (lit(2.0) * (col("n_ref") + nBins).cast("double")
            * (col("n_cur") + nBins).cast("double")), 6).as("tvd"),
        round(col("max_num").cast("double") /
          ((col("n_ref") + nBins).cast("double")
            * (col("n_cur") + nBins).cast("double")), 6).as("worst_gap"),
        round(col("psi_raw"), 6).as("psi"))
      .orderBy(col(keyCol))
  }
}
