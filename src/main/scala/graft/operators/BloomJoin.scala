package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter-prefiltered joins — the "runtime filter" pattern, made
  * explicit as an operator.
  *
  * At 100 TB the dominant cost of `big ⋈ small` is shuffling the big
  * side; when most big-side rows have no partner, almost all of that
  * shuffle I/O is wasted. The fix: build a Bloom filter over the small
  * side's keys (one tiny aggregation), embed it as a literal in a
  * codegen'd `might_contain` predicate on the big side, and drop
  * non-candidate rows AT THE SCAN, before the exchange. The residual
  * false positives (rate `fpp`) are scrubbed by the exact join that
  * follows, so results are exactly the plain join's — the bloom pass
  * only changes how many rows reach the shuffle.
  *
  * Spark's own AQE injects this silently for some shapes
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); this operator
  * makes it deterministic and available to callers whose small side is
  * a computed frame AQE can't see through. Uses the engine's native
  * `BloomFilterAggregate` / `BloomFilterMightContain` expressions over
  * `xxhash64(key)` — the same pair `InjectRuntimeFilter` plants, fully
  * codegen'd, no UDF.
  *
  * Contract: `small` must be broadcast-sized (its keys are aggregated
  * to one serialized filter on the driver — same size class as a
  * broadcast hash table). Enforced fail-fast like
  * [[Similarity.bruteForceTopK]]'s query-side bound.
  */
object BloomJoin {

  /** Driver-side distinct-key bound for the small side: past this the
    * serialized filter (and the broadcast join that follows) stops
    * being "small" — callers should shuffle-join instead. */
  val MaxSmallKeys = 4000000L

  /** A `might_contain(bloom(smallKeys), xxhash64(bigKey))` Column.
    * Exposed for callers who want the predicate alone (e.g. to
    * prefilter several big frames with one build). */
  def mightContainIn(small: DataFrame, smallKey: String,
      maxKeys: Long = MaxSmallKeys)(big: Column): Column = {
    val nKeys = small.select(smallKey).na.drop().distinct().count()
    require(nKeys <= maxKeys,
      s"bloomSemiJoin small side has $nKeys distinct keys (> $maxKeys): " +
        "the driver-built filter stops being broadcast-small; shuffle-join instead")
    val hashed = GraftBridge.column(
      new XxHash64(Seq(GraftBridge.expression(col(smallKey)))))
    val agg = new BloomFilterAggregate(
      GraftBridge.expression(hashed), math.max(nKeys, 1L))
    val bytes = small
      .select(GraftBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        Literal.create(bytes,
          org.apache.spark.sql.types.BinaryType),
        new XxHash64(Seq(GraftBridge.expression(big)))))
  }

  /** `big ⋉ small` on `bigKey = smallKey`, with the big side
    * bloom-prefiltered before the exchange. Exact semantics of a plain
    * left-semi join (false positives are removed by the real join). */
  def bloomSemiJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String): DataFrame = {
    val keys = small.select(col(smallKey)).na.drop().distinct()
    val pre = big.filter(mightContainIn(keys, smallKey)(col(bigKey)))
    pre.join(broadcast(keys), pre(bigKey) === keys(smallKey), "left_semi")
  }
}
