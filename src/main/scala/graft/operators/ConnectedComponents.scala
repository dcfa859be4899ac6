package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair list — the transitive
  * closure pass that upgrades greedy near-dup removal
  * ([[Dedup.removePairs]]) to true cluster dedup: docs A~B and B~C end
  * up in one component even though (A,C) was never directly paired.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * standard shuffle-based CC with O(log² n) round convergence, chosen
  * over plain min-label propagation whose round count is the graph
  * DIAMETER (adversarially O(n) on chain-shaped dup clusters, exactly
  * the shape near-dup pair lists produce). Each round is two
  * agg+join passes on the edge list keyed by node id — no
  * `collect_list` neighborhoods, so a hub vertex with millions of
  * neighbors never materializes its adjacency in one row (skew-safe
  * at 100 TB; the per-key state is one running `min`).
  *
  * Lineage is truncated every round via `localCheckpoint` (iterative DF
  * algorithms otherwise stack O(rounds) plan nodes and choke the
  * optimizer); convergence is detected by an order-insensitive
  * checksum of the oriented edge set.
  */
object ConnectedComponents {

  private def checksum(edges: DataFrame): (Long, Long) = {
    // xor-fold: order-insensitive and overflow-free (a summed checksum
    // trips ANSI long-overflow on any realistic edge count)
    val r = edges.agg(count(lit(1)),
      coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Connected components of the undirected graph given by `pairs`.
    * Returns one row per vertex that appears in any pair:
    * (`id`, `component`) where `component` is the minimum vertex id of
    * the component (the same keep-lowest convention as [[Dedup]]).
    * Ids must be an orderable column type; the output preserves it.
    *
    * Hybrid finish: star rounds SHRINK the edge set (toward one edge
    * per non-root vertex), and each round costs a fixed number of
    * shuffled jobs regardless of size — latency-dominated once the
    * graph is small. So whenever the current edge count is ≤
    * `localFinishThreshold` (for long/int/string ids), the remaining
    * work runs as a driver-side union-find over a BOUNDED collect —
    * the same bounded-driver-data precedent as a broadcast hash join,
    * and the same local-finish phase every production CC (GraphX,
    * GraphFrames) ships. Set the threshold to 0 to force pure
    * distributed rounds (the differential spec pins both paths to
    * identical labels). */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 30, localFinishThreshold: Long = 1L << 20): DataFrame = {
    // Orient big→small, drop self loops and dup edges.
    // Lazy localCheckpoint: the checksum action right after is what
    // materializes the checkpoint blocks, so each round costs ONE job,
    // not a separate eager-checkpoint job plus the checksum.
    var edges = pairs
      .select(col(aCol).as("x"), col(bCol).as("y"))
      .where(col("x") =!= col("y"))
      .select(greatest(col("x"), col("y")).as("u"),
        least(col("x"), col("y")).as("v"))
      .distinct()
      .localCheckpoint(false)

    val idType = edges.schema("u").dataType
    val localOrd = anyOrdering(idType)

    var prev = checksum(edges)
    var it = 0
    var done = prev._1 == 0L
    while (!done && it < maxIters) {
      if (localOrd.isDefined && prev._1 <= localFinishThreshold) {
        val collected = edges.select(col("u"), col("v")).collect() // bounded: ≤ localFinishThreshold edges (checked above)
          .map(r => (r.get(0), r.get(1)))
        return localFinish(pairs.sparkSession, collected, localOrd.get, idType)
      }
      // large-star: over the symmetric neighborhood of u, attach every
      // LARGER neighbor v to m(u) = min(Γ(u) ∪ {u}). m ≤ u < v keeps
      // the big→small orientation invariant.
      val sym = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val lsMin = sym.groupBy("u")
        .agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val ls = sym.join(lsMin, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()

      // small-star: neighbors of u are now all smaller; re-attach each
      // of them (and u itself) to the minimum one.
      val ssMin = ls.groupBy("u").agg(min("v").as("m"))
      val ss = ls.join(ssMin, "u")
        .where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(ssMin.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(false)

      val cur = checksum(ss)
      done = cur == prev
      prev = cur
      edges = ss
      it += 1
    }

    // Converged: edges form depth-1 stars (v → component root). Roots
    // appear only on the small side; give them their self-label.
    val members = edges.select(col("u").as("id"), col("v").as("component"))
    val roots = edges.select(col("v").as("id"))
      .distinct()
      .join(members.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    members.union(roots)
  }

  /** Orderings for the id types the local finish supports; anything
    * else stays on the distributed rounds. */
  private def anyOrdering(dt: org.apache.spark.sql.types.DataType)
      : Option[Ordering[Any]] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType    => Some(Ordering.by((a: Any) => a.asInstanceOf[Long]))
      case IntegerType => Some(Ordering.by((a: Any) => a.asInstanceOf[Int]))
      case StringType  => Some(Ordering.by((a: Any) => a.asInstanceOf[String]))
      case _           => None
    }
  }

  /** Driver-side union-find over a bounded edge list (union by min —
    * the surviving root of each merge is the smaller id, so final
    * roots are component minima, matching the star rounds). */
  private def localFinish(
      spark: org.apache.spark.sql.SparkSession,
      edges: Array[(Any, Any)], ord: Ordering[Any],
      dt: org.apache.spark.sql.types.DataType): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType}
    import scala.jdk.CollectionConverters._
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    val rows: java.util.List[Row] =
      parent.keysIterator.map(v => Row(v, find(v))).toList.asJava
    spark.createDataFrame(rows,
      StructType(Seq(StructField("id", dt), StructField("component", dt))))
  }

  /** Cluster-true near-dup removal: keep exactly one doc (the minimum
    * id) per connected component of the pair graph — the transitive
    * upgrade of [[Dedup.removePairs]]. One CC pass + one anti join. */
  def removePairsTransitive(df: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame = {
    val cc = connectedComponents(pairs, "id_a", "id_b")
    df.join(cc.where(col("id") =!= col("component"))
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")
  }
}
