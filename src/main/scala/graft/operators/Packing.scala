package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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
  def packGreedy(
      df: DataFrame, groupCol: String, orderCol: String,
      sizeCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"packGreedy: budget must be positive, got $budget")
    val in = df.select(
      col(groupCol).cast("string"), col(orderCol).cast("long"),
      col(sizeCol).cast("long"))
    val outSchema = StructType(Seq(
      StructField(groupCol, org.apache.spark.sql.types.StringType),
      StructField(orderCol, LongType),
      StructField(sizeCol, LongType),
      StructField("bin", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    in.repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(orderCol))
      .mapPartitions { rows =>
        // forward scan; state resets at each group boundary
        var curGroup: String = null
        var bin = 0L
        var fill = 0L
        rows.map { r =>
          val g = r.getString(0)
          val size = r.getLong(2)
          if (g != curGroup) { curGroup = g; bin = 1L; fill = size }
          else if (fill + size > budget) { bin += 1L; fill = size }
          else fill += size
          Row(g, r.getLong(1), size, bin)
        }
      }(enc)
  }
}
