package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared filesystem plumbing for the persisted-index family's
  * hive-partitioned delta layout (`<table>/batch_id=<id>` — see
  * [[Dedup.buildSpanIndex]] for the write contract it carries).
  * Centralized so every index clears/lists through one audited path
  * rather than five hand-rolled Hadoop snippets. */
private[graft] object IndexLayout {

  /** Recursively delete a table directory (no-op when absent) — the
    * build-side reset: a rebuild must clear PRIOR batch partitions,
    * which a per-partition overwrite cannot (it only replaces its own
    * `batch_id` dir). */
  def clear(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Compact one delta table: fold all `batch_id` partitions through
    * `fold` into a single `batch_id=-1` base, under the
    * [[graft.fs.RecordLog]] crash-safe staged-swap protocol (VERDICT
    * r11 #7 — append-forever deltas otherwise grow one file set per
    * micro-batch until the probe's scan is a metadata storm):
    *
    *  1. recover any prior interrupted compact (a marked stage is
    *     durable → finish its swap; an unmarked stage is garbage →
    *     discard),
    *  2. write the folded table to a SIBLING stage dir (invisible to
    *     probes reading `tableDir`),
    *  3. drop a `_STAGED` marker — the folded data is now durable,
    *  4. swap: delete the live table, rename the stage into place.
    *
    * A crash before (3) discards the stage next time. A crash after
    * (3) but before the live delete ALSO discards it — the fold is
    * re-derivable from live, which may have received appends since
    * the crash (see [[recoverCompact]]); only the mid-swap crash
    * (live already deleted) finishes the rename, because there the
    * stage is the sole surviving copy. Probes
    * racing the swap window can see a missing dir: compaction runs
    * under the index family's single-writer/quiescence contract
    * ([[graft.fs.DirLock]] is the opt-in cross-process guard), and a
    * replay of a pre-compaction batchId afterwards would re-add
    * already-folded deltas — compact only beyond the replay
    * horizon, OR pass `excludeBatchId` (r15, VERDICT r14 #7): that
    * batch's partition is preserved VERBATIM in the compacted table
    * instead of folded into the base, so the one batch still inside
    * the replay horizon — a streaming gate compacting at its own
    * micro-batch boundary — keeps its overwrite-idempotent partition
    * and its probe exclusion (a fold would hide the prior attempt's
    * rows inside `batch_id=-1`, where `excludeBatchId` probes can no
    * longer see past them: the batch would dedup against itself). */
  def compactTable(spark: SparkSession, tableDir: String,
      partitionByCols: Seq[String] = Nil,
      excludeBatchId: Option[Long] = None)(
      fold: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Unit = {
    val live = new org.apache.hadoop.fs.Path(tableDir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompact(spark, tableDir)
    val stage = new org.apache.hadoop.fs.Path(tableDir + StageSuffix)
    val all = spark.read.parquet(tableDir)
    val foldIn = excludeBatchId match {
      case Some(b) if all.columns.contains("batch_id") =>
        all.filter(org.apache.spark.sql.functions.col("batch_id") =!= b)
      case _ => all
    }
    val w = fold(foldIn).write.mode("overwrite")
    (if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*)
     else w).parquet(s"$stage/batch_id=-1")
    // the excluded batch's partition rides into the stage untouched
    // (rewritten, not folded) — the table stays complete through the
    // swap and the batch's own append overwrite stays idempotent
    excludeBatchId.foreach { b =>
      val part = new org.apache.hadoop.fs.Path(live, s"batch_id=$b")
      if (fs.exists(part)) {
        val pw = spark.read.parquet(part.toString).write.mode("overwrite")
        (if (partitionByCols.nonEmpty) pw.partitionBy(partitionByCols: _*)
         else pw).parquet(s"$stage/batch_id=$b")
      }
    }
    fs.create(new org.apache.hadoop.fs.Path(stage, Marker), true).close()
    swapStage(fs, stage, live)
  }

  /** Crash-safe WHOLE-INDEX rebuild (r12) — the offline-RETRAIN path
    * the IVF/PQ quantizer-drift contract defers to ("retraining is a
    * rare offline event"): `build` writes a complete fresh index
    * (centroids/codebooks AND data tables) into a SIBLING stage dir
    * invisible to probes, then the marker + swap make it live
    * atomically-enough — the same protocol as [[compactTable]], at
    * the index-dir level (`<indexDir>__staged`, so it never collides
    * with a table-level compact stage under `<indexDir>/<table>`).
    *
    * Without this, a retrain is `build*Index` over the live dir:
    * centroids overwrite FIRST, assignment second — a crash between
    * them serves a new quantizer over the old assignment (silently
    * wrong probes, not just missing data). Here any crash that leaves
    * the live index standing leaves it UNTOUCHED (the stage — marked
    * or not — is discarded on the next write: a retrain is always
    * re-runnable, while live may have taken appends since the crash);
    * only the mid-swap crash, where live is already gone, is finished
    * from the durable stage ([[recoverCompact]]'s rule). Same
    * single-writer/quiescence contract as compaction;
    * a replayed append from before the retrain re-lands its batch
    * under the NEW quantizer — correct by the frozen-quantizer append
    * contract (assignment is recomputed, not replayed). */
  def stagedRebuild(spark: SparkSession, indexDir: String)(
      build: String => Unit): Unit = {
    val live = new org.apache.hadoop.fs.Path(indexDir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompact(spark, indexDir) // finish a marked / drop a garbage stage
    val stage = new org.apache.hadoop.fs.Path(indexDir + StageSuffix)
    build(stage.toString)
    fs.create(new org.apache.hadoop.fs.Path(stage, Marker), true).close()
    swapStage(fs, stage, live)
  }

  /** Recover a crashed compact/rebuild's stage; called at the start
    * of every [[compactTable]] / [[stagedRebuild]].
    *
    * An UNMARKED stage is garbage (pre-marker crash) — discarded. A
    * MARKED stage is finished ONLY when the live dir is MISSING: that
    * is the mid-swap crash (after `delete(live)`, before the rename),
    * the one state where the stage is the sole surviving copy. When
    * the live dir still EXISTS, the marked stage is discarded even
    * though its data is durable — the fold/rebuild that produced it
    * is always RE-DERIVABLE from live, while the live table may have
    * received appends AFTER the crash (days of ingest before anyone
    * re-ran maintenance); swapping the stale stage in would silently
    * destroy those batches. Re-deriving a compact is cheap; a lost
    * append is unrecoverable. */
  def recoverCompact(spark: SparkSession, tableDir: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(tableDir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new org.apache.hadoop.fs.Path(tableDir + StageSuffix)
    if (!fs.exists(stage)) return
    if (fs.exists(new org.apache.hadoop.fs.Path(stage, Marker)) &&
        !fs.exists(live))
      swapStage(fs, stage, live) // mid-swap crash: stage is the only copy
    else fs.delete(stage, true) // stale stage: live wins, re-derive later
  }

  private def swapStage(fs: org.apache.hadoop.fs.FileSystem,
      stage: org.apache.hadoop.fs.Path,
      live: org.apache.hadoop.fs.Path): Unit = {
    if (fs.exists(live)) fs.delete(live, true)
    if (!fs.rename(stage, live))
      throw new java.io.IOException(s"compact swap: rename $stage -> $live")
    fs.delete(new org.apache.hadoop.fs.Path(live, Marker), false)
  }

  private val StageSuffix = "__staged"
  private val Marker = "_STAGED"

  /** Where an index's cross-process [[graft.fs.DirLock]] lives: a
    * SIBLING dir, never inside the index itself — a whole-index
    * [[stagedRebuild]] swap deletes the live dir, and a lock stored
    * there would be destroyed BY the guarded operation (the holder
    * would then fail its own release as "stolen"). One path rule for
    * every family's `*Locked` variant, so appends, compactions, and
    * rebuilds of the same index all serialize on the same file. */
  def lockDir(indexDir: String): String =
    indexDir.stripSuffix("/") + "__lock"

  /** Number of data files under a table directory (recursive,
    * `_`-prefixed metadata excluded) — the compaction specs'
    * file-count-collapse evidence. */
  def dataFileCount(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
  }
}
