package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table plumbing: the co-located-join story for 100 TB.
  *
  * A fact-to-fact join (orders ⋈ lineitem) shuffles BOTH sides on the
  * join key every query. Writing each side once, bucketed by that key
  * into the same bucket count, makes every subsequent join/aggregation
  * on the key shuffle-free: Spark's FileSourceScanExec reports the
  * bucket HashPartitioning, so EnsureRequirements inserts no Exchange
  * (asserted by PlanSpec). At scale this converts the recurring
  * O(data) shuffle of every downstream query into a one-time write.
  *
  * The reference has no analogue (SQLite indexes play this role,
  * feature_store.py:176-193); this is Spark-native scale design.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table at `path` unless the
    * session already knows it. One file per bucket (repartition on the
    * bucket key first, same Murmur3 hash as the bucket spec), so bucket
    * reads are single-file and the on-disk sort order survives —
    * letting sort-merge joins skip their sort.
    *
    * Rewrites on the first call of each session: /tmp artifacts can
    * outlive the in-memory catalog that described them, and a stale
    * path must not serve a fresh catalog entry.
    *
    * The tableExists guard is session-local, so `path` MUST be unique
    * per JVM (callers embed the pid — see SparkEntry's bucketed join):
    * two concurrent processes sharing a path would both see a missing
    * table and race overwriting it, and one could read a half-written
    * table (ADVICE r4). A real deployment writes bucketed tables once
    * into a shared metastore under a coordinated job, not per-process
    * scratch dirs; per-pid paths are the local-mode stand-in.
    */
  def ensureBucketed(
      spark: SparkSession,
      df: => DataFrame,
      table: String,
      path: String,
      key: String,
      buckets: Int): DataFrame =
    ensureBucketed(spark, df, table, path, Seq(key), buckets)

  /** Composite-key form: real stores key entities on (tenant, entity)-
    * style tuples, and PIT serving groups on that tuple. Bucketing by
    * the full tuple reports `HashPartitioning(keys)` from the scan, so
    * a composite-key `groupBy`/`max_by` serve — [[graft.fs.Serving]]'s
    * `latestAsOf(keys, …)` — runs with ZERO exchanges, exactly like
    * the single-key path (PlanSpec asserts both). */
  def ensureBucketed(
      spark: SparkSession,
      df: => DataFrame,
      table: String,
      path: String,
      keys: Seq[String],
      buckets: Int): DataFrame = {
    require(keys.nonEmpty, "ensureBucketed: need at least one bucket column")
    if (!spark.catalog.tableExists(table)) {
      df.repartition(buckets, keys.map(col): _*)
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
        .format("parquet")
        .saveAsTable(table)
    }
    spark.table(table)
  }
}
