package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-point PageRank over an explicit edge list — graph centrality
  * for data curation (score nodes of a kNN/similarity/link graph by
  * how much the graph "points at" them; the representativeness signal
  * behind graph-based coreset selection and link-quality propagation).
  *
  * All arithmetic is INTEGER: scores live in units of `scale` (10¹²),
  * each out-edge carries `score·dampNum div (dampDen·deg)` and every
  * node restarts from `scale·(dampDen−dampNum) div dampDen`. Integer
  * sums are order-independent, so a fixed iteration count yields
  * bit-identical scores on any engine — the float formulation's
  * Σ-order drift (and its libm-free teleport term) is designed out.
  * The floor in the per-edge division leaks a few units of mass per
  * hop; rankings are unaffected at scale=10¹² (documented trade, same
  * family as the tf-idf rational idf).
  *
  * Scale shape: the classic iterative join-agg — per iteration one
  * join of edges⋈scores on src (both sides partitionable by src; a
  * production loop would pre-partition edges once and reuse) and one
  * sum-exchange on dst. Edges (+ out-degrees) are materialized ONCE
  * via localCheckpoint: without it every iteration re-derives the
  * whole upstream edge-building subtree (kNN, dedup pairs, …) — the
  * diamond-recompute trap. Dangling nodes keep the restart mass only.
  */
object PageRank {

  /** Run `iters` synchronous PageRank iterations. `edges` needs
    * (src, dst) columns, `nodes` a single `id` column covering every
    * vertex (including dangling ones). Returns (id, score) with score
    * in fixed-point `scale` units. */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int,
      scale: Long = 1000000000000L,
      dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .localCheckpoint(false)
    val base = scale * (dampDen - dampNum) / dampDen
    val ids = nodes.select(col("id"))
    var score = ids.withColumn("score", lit(scale))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(score.withColumnRenamed("id", "src"), "src")
        .withColumn("c", expr(s"score * $dampNum div ($dampDen * deg)"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
      score = ids
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("in_sum"), lit(0L))).as("score"))
        // truncate lineage per round — an iters-deep nested join-agg
        // plan grows Catalyst analysis superlinearly (same fix as
        // ConnectedComponents' per-round checkpoint)
        .localCheckpoint(false)
    }
    score
  }
}
