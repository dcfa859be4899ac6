package graft

import graft.plans.BoundedTopK

/** The one-call recommended-conf helper (r17, VERDICT r16 missing #1)
  * and the heap-derived hash-agg threshold behind it (VERDICT r16 #1).
  */
class GraftConfSpec extends SparkSpec {

  private val thresholdKey =
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

  test("recommendedHashAggKeys derives from heap budget, concurrency " +
      "and entry bytes — floored at Spark's default, Int-clamped") {
    // the bench geometry: 16 GiB heap × 3/8 budget, 32 slots, 384 B
    // entries → 2^19 keys (the value BASELINE.md r17 measures under)
    val budget = (17179869184L * 0.375).toLong
    assert(BoundedTopK.recommendedHashAggKeys(budget, 32) == (1L << 19))
    // inverse in slots and entry bytes
    assert(BoundedTopK.recommendedHashAggKeys(budget, 16) == (1L << 20))
    assert(BoundedTopK.recommendedHashAggKeys(budget, 32,
      entryBytes = 768L) == (1L << 18))
    // a tiny heap never drops below Spark's own 128 default…
    assert(BoundedTopK.recommendedHashAggKeys(1024L, 32) == 128L)
    // …and a huge one clamps to the conf's Int range
    assert(BoundedTopK.recommendedHashAggKeys(Long.MaxValue, 1) ==
      Int.MaxValue.toLong)
    // entry sizing: k-aware, monotonic, never below the k=1 floor
    assert(BoundedTopK.entryBytes(1) == 240L)
    assert(BoundedTopK.entryBytes(10) == BoundedTopK.DefaultEntryBytes)
    assert(BoundedTopK.entryBytes(64) > BoundedTopK.entryBytes(5))
    intercept[IllegalArgumentException] {
      BoundedTopK.recommendedHashAggKeys(0L, 32)
    }
    intercept[IllegalArgumentException] {
      BoundedTopK.recommendedHashAggKeys(1024L, 0)
    }
  }

  test("hashAggHeapBudgetBytes: 3/8 of heap by default, overridable " +
      "through the validated graft.hashAggHeapBudgetBytes dial") {
    assert(GraftConf.hashAggHeapBudgetBytes(1L << 30) ==
      ((1L << 30) * 0.375).toLong)
    sys.props("graft.hashAggHeapBudgetBytes") = "12345"
    try assert(GraftConf.hashAggHeapBudgetBytes(1L << 30) == 12345L)
    finally sys.props.remove("graft.hashAggHeapBudgetBytes")
    sys.props("graft.hashAggHeapBudgetBytes") = "0"
    try intercept[IllegalArgumentException] {
      GraftConf.hashAggHeapBudgetBytes(1L << 30)
    } finally sys.props.remove("graft.hashAggHeapBudgetBytes")
    sys.props("graft.hashAggHeapBudgetBytes") = "lots"
    try intercept[IllegalArgumentException] {
      GraftConf.hashAggHeapBudgetBytes(1L << 30)
    } finally sys.props.remove("graft.hashAggHeapBudgetBytes")
  }

  test("applyTo sets the derived threshold on a LIVE session from the " +
      "session's own heap and slots; recommended(builder) carries the " +
      "same value plus the static dials") {
    val prev = spark.conf.get(thresholdKey)
    try {
      GraftConf.applyTo(spark)
      val expected = GraftConf.recommendedHashAggKeys(
        GraftConf.executorHeapBytes(spark), GraftConf.taskSlots(spark))
      assert(spark.conf.get(thresholdKey) == expected.toString)
      // derived and sane: at least Spark's default, int-ranged
      assert(expected >= 128L && expected <= Int.MaxValue.toLong,
        s"derivation degenerated: $expected")
    } finally spark.conf.set(thresholdKey, prev)
    // builder path: the configs land without touching the live session
    val b = org.apache.spark.sql.SparkSession.builder()
    GraftConf.recommended(b, heapBytes = 17179869184L, taskSlots = 32)
    // (builder internals aren't inspectable; the value itself is the
    // contract — assert the derivation the builder call used)
    assert(GraftConf.recommendedHashAggKeys(17179869184L, 32) ==
      (1L << 19))
    // local-session environment probes
    assert(GraftConf.taskSlots(spark) == 4, "local[4] must give 4 slots")
    assert(GraftConf.executorHeapBytes(spark) ==
      Runtime.getRuntime.maxMemory)
  }

  test("bench local-dir routing: RAM-backed shuffle dirs ONLY for the " +
    "driver's small-sf testdata tree, never for scale dirs; the env " +
    "override wins both ways (r17 — the sys>user 'hot window' was the " +
    "harness's own shuffle-file churn on the virtio disk)") {
    // scale-calibration dirs must stay on disk regardless of /dev/shm:
    // their shuffle + DISK_ONLY pinned blocks are GBs by design
    for (d <- Seq("/tmp/graft_sf1", "/tmp/graft_sf10", "/tmp/graft_sf100"))
      assert(Bench.localDirFor(d, overrideDir = None).isEmpty,
        s"scale dir $d must not get a RAM-backed local.dir")
    // driver testdata: RAM-backed iff /dev/shm exists with ≥8 GiB free
    // (probe the same condition the implementation uses, so this spec
    // is environment-honest rather than environment-assuming)
    val shm = java.nio.file.Paths.get("/dev/shm")
    val shmOk = java.nio.file.Files.isDirectory(shm) &&
      java.nio.file.Files.getFileStore(shm).getUsableSpace > (8L << 30)
    assert(Bench.localDirFor("/root/testdata/sf0.1", overrideDir = None)
      .isDefined == shmOk)
    assert(Bench.localDirFor("/root/testdata/sf0.01", overrideDir = None)
      .isDefined == shmOk)
    // explicit override wins in both directions
    assert(Bench.localDirFor("/root/testdata/sf0.1",
      overrideDir = Some("/scratch/disk1")).contains("/scratch/disk1"))
    assert(Bench.localDirFor("/tmp/graft_sf100",
      overrideDir = Some("/dev/shm/i-know-it-fits"))
      .contains("/dev/shm/i-know-it-fits"))
    // empty override = unset
    assert(Bench.localDirFor("/tmp/graft_sf100",
      overrideDir = Some("")).isEmpty)
  }
}
