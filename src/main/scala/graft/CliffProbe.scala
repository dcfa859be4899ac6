package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the hash-aggregation HEAP CLIFF (r17,
  * VERDICT r16 #1 — "measure the cliff, then show the guard routes
  * around it").
  *
  * The corpus-keyed [[graft.plans.BoundedTopK]] fold has three
  * regimes: map-side HASH (fast, but per-task map bytes invisible to
  * Spark's memory manager), sort-fallback (spillable), and the pair
  * RE-KEY (bounded state, forfeits map-side combining). The r16 skip
  * condition chose hash on key COUNT alone; this probe generates the
  * exact aggregation shape the graph builders feed
  * `Similarity.topKPerQuery` — Q query keys × `occ` pair rows each,
  * pure codegen, no joins, nothing else resident — so the map's
  * growth is the ONLY heap consumer and the cliff location is
  * attributable.
  *
  * Modes (CLIFF_MODE):
  *  - `unguarded`: threshold + heap-budget dial forced huge — the r16
  *    behavior; at fifth-decade keys/task this is the arm that dies.
  *  - `guarded`: the derived [[GraftConf]] conf, guard decides —
  *    shows the same load routing to the re-key and completing.
  *  - `rekey`: budget forced to 1 — the re-key floor for result
  *    identity and cost comparison.
  *
  * Env: CLIFF_QUERIES (default 10M), CLIFF_OCC (32), CLIFF_K (5),
  * CLIFF_MODE (guarded), SPARK_GRAFT_CPUS (32). Prints ONE JSON line:
  * checksums must match across modes at any Q where both complete.
  */
object CliffProbe {
  def main(args: Array[String]): Unit = {
    val q = sys.env.getOrElse("CLIFF_QUERIES", "10000000").toLong
    val occ = sys.env.getOrElse("CLIFF_OCC", "32").toInt
    val k = sys.env.getOrElse("CLIFF_K", "5").toInt
    val mode = sys.env.getOrElse("CLIFF_MODE", "guarded")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.buffer.pageSize", "4m")
    val spark = (mode match {
      case "unguarded" =>
        sys.props("graft.hashAggHeapBudgetBytes") = Long.MaxValue.toString
        builder.config(
          "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          Int.MaxValue.toString)
      case "rekey" =>
        sys.props("graft.hashAggHeapBudgetBytes") = "1"
        GraftConf.recommended(builder, taskSlots = cpus.toInt)
      case "guarded" =>
        GraftConf.recommended(builder, taskSlots = cpus.toInt)
      case other => sys.error(s"CLIFF_MODE=$other"); builder
    }).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // peak-heap sampler: a daemon polling used heap every 25 ms — the
    // map's growth dominates this probe's heap by construction
    val peak = new java.util.concurrent.atomic.AtomicLong(0L)
    val mem = java.lang.management.ManagementFactory.getMemoryMXBean
    val sampler = new Thread(() => {
      while (true) {
        val used = mem.getHeapMemoryUsage.getUsed
        peak.updateAndGet(p => math.max(p, used))
        Thread.sleep(25)
      }
    })
    sampler.setDaemon(true); sampler.start()

    val pairs = q * occ
    // synthetic scored pairs: query_id contiguous per input split
    // (range is ordered), neighbor ids and sims from xxhash64 mixing —
    // deterministic so cross-mode checksums must agree, and (unlike a
    // multiplicative mix) free of ANSI Long-overflow at any row count
    val scored = spark.range(pairs).select(
      (col("id") / occ).cast("long").as("query_id"),
      pmod(xxhash64(col("id")), lit(math.max(q, 7L))).as("neighbor_id"),
      (pmod(xxhash64(col("id"), lit(42)), lit(1000003L)) / 1000003.0)
        .as("sim"))
    val top = graft.operators.Similarity.topKPerQuery(scored, k,
      expectedPairs = pairs, expectedQueries = q)
    val rekeyPlanned = top.queryExecution.optimizedPlan.toString
      .contains("RepartitionByExpression")
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val cpu0 = osBean.getProcessCpuTime
    val t0 = System.nanoTime()
    val out = top.agg(
        count(lit(1)).as("rows"),
        // bit_xor: order-independent AND overflow-free at any row count
        // (a sum of 240M 64-bit hashes would trip ANSI long overflow)
        bit_xor(xxhash64(col("query_id"), col("neighbor_id"), col("rank")))
          .as("checksum"))
      .collect()(0) // bounded: global agg — exactly one row
    val wall = (System.nanoTime() - t0) / 1e9
    val cpuS = (osBean.getProcessCpuTime - cpu0) / 1e9
    val conf = spark.sessionState.conf
    println(s"""{"probe":"hash_cliff","mode":"$mode","queries":$q,""" +
      s""""occ":$occ,"k":$k,"cpus":$cpus,""" +
      s""""keysPerTask":${q / math.max(1, conf.numShufflePartitions)},""" +
      s""""threshold":${conf.objectAggSortBasedFallbackThreshold},""" +
      s""""budgetBytes":${GraftConf.hashAggHeapBudgetBytes()},""" +
      s""""rekeyPlanned":$rekeyPlanned,"rows":${out.getLong(0)},""" +
      s""""checksum":${out.getLong(1)},"wallSec":${"%.2f".format(wall)},""" +
      s""""cpuSec":${"%.2f".format(cpuS)},""" +
      s""""peakHeapMB":${peak.get() / (1024 * 1024)}}""")
    spark.stop()
  }
}
