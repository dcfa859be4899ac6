package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incrementally-maintained aggregate tables — the corpus-statistics
  * twin of `Serving.refreshLatest`: a stats table (per-key counts and
  * sums) folds in each new shard touching |stats| + |shard| rows,
  * never the history. Works because the maintained aggregates are
  * MERGEABLE: counts and sums add; means and rates derive at read
  * time. Sums ride as exact decimals so the fold order can't drift a
  * double — the incremental result is bit-identical to a full
  * recompute, which is exactly what the declared query's oracle
  * checks.
  */
object IncrementalAgg {

  private val Dec = DecimalType(28, 6)

  /** One shard's partial: per-key row count + exact decimal sum of
    * `valueCol` (pre-rounded to 6 decimals, the repo's canonical float
    * contract). Output columns: keys..., n, s. */
  def partial(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(round(col(valueCol), 6).cast(Dec)).cast(Dec).as("s"))

  /** Fold a new shard's [[partial]] into the maintained table: union +
    * re-aggregate — one exchange over |prev| + |delta| keyed rows.
    * Decimal sums make the merge associative and exact, so
    * fold(fold(p1, p2), p3) == partial(whole) bit-for-bit. */
  def merge(prev: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    prev.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("s")).cast(Dec).as("s"))
}
