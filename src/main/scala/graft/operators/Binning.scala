package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leak-free quantile (equi-probable) feature binning — the
  * fit-on-train / apply-on-eval discretizer: bin CUTS are exact
  * per-group percentiles of the TRAINING split only, then every eval
  * row is labeled by how many cuts lie strictly below its value. The
  * eval distribution never influences the cuts — same leakage contract
  * as the z-score scaler (`q_fit_transform`).
  *
  * Determinism: cuts round at 6 dp (the exact-percentile cross-engine
  * convention `q_percentile` established); the bin label is an integer
  * count of strict comparisons against those rounded cuts, so labels
  * replay exactly. A value equal to a cut falls in the LOWER bin
  * (`value > cut` is strict).
  *
  * Scale shape: fitting is one exact-percentile aggregate per group —
  * exact percentiles sort within groups, the right tool up to
  * fact-table scale per group; at extreme scale swap
  * `approx_percentile` (t-digest, mergeable) for the fit and keep the
  * apply side unchanged. Applying is a broadcast join of the
  * groups×(nBins−1) cut table plus a map-side count — zero
  * data-sized shuffles.
  */
object Binning {

  /** Fit cuts on `train`, label `applyTo`: adds `qs` (the group's cut
    * array) and `bin` to every applyTo row — `bin` ∈ [0, nBins) for
    * groups the training split knows, and the `-1` sentinel for a
    * group with NO training cuts (a category that launched after the
    * train cutoff). Surfacing beats silently dropping: an inner join
    * here would shrink the eval frame with no error, and downstream
    * metrics would exclude the new category unnoticed (review r9). */
  def quantileBins(
      train: DataFrame, applyTo: DataFrame,
      groupCol: String, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, s"quantileBins: nBins=$nBins")
    val ps = (1 until nBins).map(i => i.toDouble / nBins)
    val cuts = train.groupBy(col(groupCol))
      .agg(expr(
        s"transform(percentile($valueCol, array(${ps.mkString(", ")})), " +
          "x -> round(x, 6))").as("qs"))
    applyTo.join(broadcast(cuts), Seq(groupCol), "left")
      .withColumn("bin",
        when(col("qs").isNull, lit(-1))
          .otherwise(size(filter(col("qs"), q => col(valueCol) > q))))
  }
}
