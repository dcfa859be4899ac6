package graft

/** Forked-JVM driver for the cross-PROCESS catalog-lock spec
  * (VERDICT r10 #8): runs the REAL `FeatureCatalog.withLock`
  * acquire/steal/release protocol in a separate process so the
  * FeatureStoreSpec can prove steal-after-crash and no-cascade-delete
  * under actual process death, not thread interleaving. No
  * SparkSession — `withLock` is pure java.nio file protocol, and the
  * catalog constructor touches only its path fields, so the child
  * stays a sub-second JVM instead of a 10 s Spark boot.
  *
  * Modes:
  *  - `crash <lockDir>`: acquire the lock, then `halt` inside the
  *    critical section — real death between createFile and the
  *    finally, leaving the on-disk state a crashed writer leaves.
  *  - `hold <lockDir> <holdMs>`: acquire, overstay the steal TTL by
  *    sleeping, then run the REAL release path; prints RELEASED so
  *    the parent can order its assertions after the release ran.
  */
object CatalogLockChild {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val lockDir = args(1)
    val cat = new graft.fs.FeatureCatalog(null, "/unused-child-root")
    // resolve by name-suffix: scala private methods can carry a
    // qualified prefix depending on access pattern
    val m = classOf[graft.fs.FeatureCatalog].getDeclaredMethods
      .find(_.getName.endsWith("withLock"))
      .getOrElse(sys.error("withLock not found"))
    m.setAccessible(true)
    def withLock[A](d: String)(body: => A): A =
      m.invoke(cat, d, (() => body): Function0[Any]).asInstanceOf[A]
    mode match {
      case "crash" =>
        withLock(lockDir) {
          // signal the parent the lock is held, then die hard — the
          // finally (release) must never run
          println("HOLDING")
          Console.flush()
          Runtime.getRuntime.halt(42)
        }
      case "hold" =>
        val holdMs = args(2).toLong
        try {
          withLock(lockDir) {
            println("HOLDING")
            Console.flush()
            Thread.sleep(holdMs)
          }
        } catch {
          // r13: an overstaying victim whose lock was stolen now fails
          // LOUDLY (DirLock.LockStolenException, possibly reflection-
          // wrapped) — the release path still ran first and must not
          // have cascade-deleted the thief's lock, which is what the
          // parent asserts after RELEASED
          case e: Throwable
              if Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
                .exists(_.isInstanceOf[graft.fs.DirLock.LockStolenException]) =>
            println("STOLEN")
        }
        // the real release ran (and, having overstayed the TTL, must
        // NOT have deleted a thief's fresh lock)
        println("RELEASED")
        Console.flush()
    }
  }
}
