package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Greedy sequence packing: assign ordered items to consecutive
  * fixed-capacity bins — the batch-prep step that concatenates
  * documents into fixed-token-budget training sequences.
  *
  * Capacity-reset semantics are the textbook case a window function
  * cannot express (the running total resets when it would overflow, so
  * each row's bin depends on every predecessor's *assigned* bin, not on
  * a prefix aggregate). The distributed design instead exploits that
  * packing is per-group sequential but across-group independent: one
  * exchange co-locates each group, a partition-local sort orders it,
  * and a single forward scan assigns bins. Parallelism = number of
  * groups (sources/shards), the same contract as any per-stream
  * sessionization; no state ever crosses a group boundary.
  *
  * At 100 TB with few sources that contract is the bottleneck
  * (VERDICT r5: a ~20-task full sort + scan of the corpus). Packing
  * never requires a GLOBAL order, only a consistent one — so
  * [[packGreedySharded]] splits each group into `nShards` deterministic
  * shards keyed off the order column (`pmod(orderCol, nShards)` —
  * engine-replayable arithmetic, no Murmur dependence) and packs each
  * (group, shard) independently. Parallelism becomes
  * #groups × nShards; every bin invariant (no overflow, 1-based
  * contiguous numbering) holds per shard. The trade is bin *identity*:
  * bins are scoped (group, shard, bin), and up to nShards partially
  * filled tail bins exist per group instead of one — bounded waste,
  * bought for cluster-wide parallelism.
  */
object Packing {

  /** Pack each `groupCol`-group's rows, ordered by `orderCol`, into
    * bins of at most `budget` total `sizeCol` units. A row never splits:
    * a bin is closed when the next row would overflow it, and a row
    * larger than the whole budget gets (at least) a bin of its own.
    * Bins number from 1 per group, in order.
    *
    * Output columns: groupCol (string), orderCol (long), sizeCol
    * (long), `bin` (long, 1-based per group).
    */

  /** Cast to long with a LOUD null guard (r12 review fix): a null
    * size/order slot — null input or a failed cast — previously died
    * deep in the partition scan as a bare unboxing NPE with no column
    * name; now the select names the offender before the scan runs. */
  private def longOrFail(c: Column, name: String, op: String): Column = {
    val cl = c.cast("long")
    when(cl.isNull, raise_error(lit(s"$op: NULL $name (null input or " +
      "failed long cast) — filter or repair the column first")))
      .otherwise(cl)
  }

  def packGreedy(
      df: DataFrame, groupCol: String, orderCol: String,
      sizeCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"packGreedy: budget must be positive, got $budget")
    val in = df.select(
      col(groupCol).cast("string"),
      longOrFail(col(orderCol), orderCol, "packGreedy"),
      longOrFail(col(sizeCol), sizeCol, "packGreedy"))
    val outSchema = StructType(Seq(
      StructField(groupCol, org.apache.spark.sql.types.StringType),
      StructField(orderCol, LongType),
      StructField(sizeCol, LongType),
      StructField("bin", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    in.repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(orderCol))
      .mapPartitions { rows =>
        // forward scan; state resets at each group boundary. `first`
        // (r12 review fix): a NULL group made `g != curGroup` false on
        // the very first row (null == null), emitting bin 0 against
        // the 1-based contract — null groups now pack as their own
        // ordinary group
        var first = true
        var curGroup: String = null
        var bin = 0L
        var fill = 0L
        rows.map { r =>
          val g = r.getString(0)
          val size = r.getLong(2)
          if (first || g != curGroup) {
            first = false; curGroup = g; bin = 1L; fill = size
          }
          else if (fill + size > budget) { bin += 1L; fill = size }
          else fill += size
          Row(g, r.getLong(1), size, bin)
        }
      }(enc)
  }

  /** Shard-parallel greedy packing — the 100 TB shape. Each group is
    * split into `nShards` deterministic shards
    * (`shard = pmod(orderCol, nShards)`), and each (group, shard)
    * packs independently with [[packGreedy]] semantics: ordered by
    * `orderCol` within the shard, bins 1-based per (group, shard),
    * a bin closed when the next row would overflow `budget`.
    *
    * Output columns: groupCol (string), `shard` (long), orderCol
    * (long), sizeCol (long), `bin` (long, 1-based per (group, shard)).
    */
  def packGreedySharded(
      df: DataFrame, groupCol: String, orderCol: String,
      sizeCol: String, budget: Long, nShards: Int): DataFrame = {
    require(budget > 0, s"packGreedySharded: budget must be positive, got $budget")
    require(nShards > 0, s"packGreedySharded: nShards must be positive, got $nShards")
    val in = df.select(
      col(groupCol).cast("string"),
      pmod(longOrFail(col(orderCol), orderCol, "packGreedySharded"),
        lit(nShards.toLong)).as("shard"),
      longOrFail(col(orderCol), orderCol, "packGreedySharded"),
      longOrFail(col(sizeCol), sizeCol, "packGreedySharded"))
    val outSchema = StructType(Seq(
      StructField(groupCol, org.apache.spark.sql.types.StringType),
      StructField("shard", LongType),
      StructField(orderCol, LongType),
      StructField(sizeCol, LongType),
      StructField("bin", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    in.repartition(col(groupCol), col("shard"))
      .sortWithinPartitions(col(groupCol), col("shard"), col(orderCol))
      .mapPartitions { rows =>
        // forward scan; state resets at each (group, shard) boundary
        // (`first`: the packGreedy null-group fix)
        var first = true
        var curGroup: String = null
        var curShard = -1L
        var bin = 0L
        var fill = 0L
        rows.map { r =>
          val g = r.getString(0)
          val sh = r.getLong(1)
          val size = r.getLong(3)
          if (first || g != curGroup || sh != curShard) {
            first = false; curGroup = g; curShard = sh; bin = 1L; fill = size
          }
          else if (fill + size > budget) { bin += 1L; fill = size }
          else fill += size
          Row(g, sh, r.getLong(2), size, bin)
        }
      }(enc)
  }

  /** Length-bucketed padding-efficiency report — the "should we pack
    * or just bucket?" audit of a dynamic-batching pipeline. Sequences
    * batched together pad to the longest member; bucketing by length
    * (bucket = floor(len / width)) bounds that waste to the in-bucket
    * spread. Per bucket this reports n_seqs, token sums, the observed
    * max length, the padded-token overhead (n·max − Σlen, the tokens a
    * pad-to-bucket-max batcher would burn) and pad_ratio =
    * round(padded / (n·max), 6) — compare against [[packGreedy]]'s
    * zero-padding bins to price the packing pass.
    *
    * One map-side projection + one keyed aggregate over at most
    * (max_len / width) bucket keys; no joins, no windows — safe at any
    * corpus size. */
  def paddingEfficiency(
      df: DataFrame,
      lenCol: Column,
      bucketWidth: Int): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth must be positive")
    val len = lenCol.cast("long")
    df.select((len / lit(bucketWidth.toLong)).cast("long").as("bucket"),
        len.as("__len"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("__len")).as("sum_len"),
        max(col("__len")).as("max_len"))
      .withColumn("padded",
        col("n_seqs") * col("max_len") - col("sum_len"))
      .withColumn("pad_ratio",
        round(col("padded").cast("double") /
          (col("n_seqs") * col("max_len")).cast("double"), 6))
  }
}
