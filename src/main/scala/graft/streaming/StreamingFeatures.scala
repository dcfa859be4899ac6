package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

import org.apache.spark.sql.Row

/** Running per-user feature row emitted by
  * [[StreamingFeatures.runningUserFeatures]]. */
final case class RunningFeature(
    user_id: Long, n_events: Long, value_sum: Double, value_max: Double)

/** State carried between micro-batches per user (mergeable running
  * aggregates only — fixed-size regardless of event count). */
final case class RunningState(n: Long, sum: Double, max: Double)

/** Structured-Streaming ingest for `frequency = streaming` feature
  * groups (the reference declares the flag but never exercises it —
  * feature_store.py:33-34; this is the §7.2 phase-5 extension).
  *
  * Shape: file-source readStream → watermark → windowed/stateful
  * transforms → `foreachBatch` append into the same [[graft.fs.RecordLog]]
  * layout batch serving reads — one storage format, two ingestion modes.
  */
object StreamingFeatures {

  /** Streaming source over an events directory with the given schema.
    * `maxFilesPerTrigger=32` keeps micro-batches bounded at scale. */
  def readEvents(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 32)
      .parquet(path)

  /** Tumbling-window per-user aggregate features with late-data
    * handling: watermark bounds state, window closes emit append-mode
    * rows. These are the rolling features a streaming group serves. */
  def windowedUserFeatures(
      events: DataFrame,
      tsCol: String = "ts",
      userCol: String = "user_id",
      valueCol: String = "value",
      windowLen: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen), col(userCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("value_sum"),
        avg(col(valueCol)).as("value_mean"))
      .select(
        col(userCol),
        col("window.end").as("ts"),
        col("n_events"), col("value_sum"), col("value_mean"))

  /** Gap-based session features on a live stream — the streaming twin
    * of [[graft.operators.Sessionize]]: `session_window` merges events
    * whose gaps are below `gap` into one growing window per user, the
    * watermark closes sessions and bounds state. Emits one row per
    * closed session. */
  def sessionWindowFeatures(
      events: DataFrame,
      tsCol: String = "ts",
      userCol: String = "user_id",
      valueCol: String = "value",
      gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("value_sum"))
      .select(
        col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("value_sum"))

  /** Exactly-once-ish dedup within the watermark horizon before feature
    * computation (dropDuplicates keyed by event id, state bounded by
    * the watermark). */
  def dedupedStream(events: DataFrame, idCol: String, tsCol: String = "ts",
      lateness: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, lateness).dropDuplicates(idCol, tsCol)

  /** Custom keyed state via `flatMapGroupsWithState`: a running
    * (count, sum, max) per user, re-emitted whenever the user sees new
    * events — the always-current serving row windowed aggregates can't
    * express (they only emit on window close). State is fixed-size per
    * key (three numbers, not an event buffer) and expires on an
    * event-time timeout `idle` past the watermark, so total state is
    * O(active users), never O(events) — the property that keeps this
    * runnable against an unbounded stream. */
  def runningUserFeatures(
      events: DataFrame,
      tsCol: String = "ts",
      userCol: String = "user_id",
      valueCol: String = "value",
      lateness: String = "10 minutes",
      idle: String = "1 hour"): Dataset[RunningFeature] = {
    import events.sparkSession.implicits._
    val idleMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(idle))
    val idleMillis =
      idleMs.days.toLong * 86400000L + idleMs.microseconds / 1000L
    events
      // project/cast BEFORE the watermark: casting a watermarked column
      // mints a fresh attribute and silently drops the watermark tag
      .select(col(userCol).cast("long"), col(tsCol).cast("timestamp"),
        col(valueCol).cast("double"))
      .withWatermark(tsCol, lateness)
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RunningState, RunningFeature](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[RunningState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prev = state.getOption.getOrElse(
              RunningState(0L, 0.0, Double.NegativeInfinity))
            var n = prev.n; var s = prev.sum; var m = prev.max
            var lastMs = 0L
            rows.foreach { r =>
              n += 1; s += r._3; m = math.max(m, r._3)
              lastMs = math.max(lastMs, r._2.getTime)
            }
            state.update(RunningState(n, s, m))
            // anchor the timeout to observed event time, not the
            // watermark: in the first batch the watermark is still 0
            // (it only advances at batch end), so a watermark-relative
            // timeout would land in 1970 and expire the state at once
            state.setTimeoutTimestamp(
              math.max(lastMs, state.getCurrentWatermarkMs()) + idleMillis)
            Iterator.single(RunningFeature(user, n, s, m))
          }
      }
  }

  /** Stream-stream enrichment join: each event picks up enrichment
    * rows (labels, profile updates) for the same key whose timestamp
    * falls within `bound` BEFORE the event. Watermarks on both sides
    * plus the time-range predicate are what let Spark drop buffered
    * rows once they can no longer match — without them a stream-stream
    * join buffers forever. Enrichment columns arrive prefixed `e_`. */
  def enrichedStream(
      events: DataFrame,
      enrich: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      enrichTsCol: String = "e_ts",
      lateness: String = "10 minutes",
      bound: String = "1 hour"): DataFrame = {
    val l = events.withWatermark(tsCol, lateness)
    val r = enrich.withWatermark(enrichTsCol, lateness)
      .withColumnRenamed(keyCol, s"e_$keyCol")
    l.join(r,
      expr(s"""$keyCol = e_$keyCol AND
               $enrichTsCol BETWEEN $tsCol - INTERVAL $bound AND $tsCol"""),
      "inner")
      .drop(s"e_$keyCol")
  }

  /** Sink: each micro-batch lands in the record-log parquet layout
    * (partitioned by snapshot date, readable by the batch serving
    * path), with REPLAY-IDEMPOTENT writes: foreachBatch gives
    * at-least-once delivery — a crash between the parquet commit and
    * the checkpoint commit re-runs the same epoch, and a plain append
    * would double those rows in the log (silent training-data
    * duplication). Partitioning by (p_date, p_epoch) under DYNAMIC
    * partition overwrite makes the replay rewrite exactly its own
    * epoch partitions and nothing else — effectively exactly-once in
    * the table for any number of replays, with no read-side dedup.
    *
    * LAYOUT OWNERSHIP: the extra p_epoch level means a stream-owned
    * log directory — pointing this sink and batch
    * [[graft.fs.RecordLog.write]] (p_date only) at the SAME directory
    * would mix partition depths and break discovery. Batch readers
    * ([[graft.fs.Serving]], plain `spark.read.parquet`) read either
    * layout fine; writers must not share a directory across modes. */
  def toRecordLog(features: DataFrame, outDir: String,
      checkpoint: String): DataStreamWriter[Row] =
    features.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("10 seconds"))
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        writeEpoch(batch, epochId, outDir)
      }

  /** Continuously-maintained latest-per-entity serving table — the
    * streaming materialized view: each micro-batch folds into the
    * stored table via [[graft.fs.Serving.refreshLatest]], so the
    * serving read is always one small scan of |entities| rows, never
    * the stream's history. Per-epoch cost is |latest| + |batch|.
    *
    * Replay-safe WITHOUT epoch bookkeeping: refreshLatest is
    * idempotent over re-delivered rows (max_by of a set unions
    * duplicates away), so an at-least-once foreachBatch replay
    * converges to the same table. The overwrite never reads its own
    * output — the folded frame is localCheckpoint-ed first, same as
    * [[graft.fs.RecordLog.compact]]. */
  /** At-ingest streaming dedup on the content fingerprint: each
    * distinct document passes once; re-deliveries and content
    * duplicates arriving within the watermark horizon are dropped —
    * the dedup gate a streaming corpus feed needs in FRONT of the
    * record log, where the batch `Dedup.incrementalNew` handles the
    * shard-vs-corpus case.
    *
    * State discipline: `dropDuplicatesWithinWatermark` keeps one state
    * row per distinct fingerprint seen inside the horizon and EVICTS
    * it when the watermark passes — a plain `dropDuplicates` on an
    * unbounded stream grows state with every distinct doc forever,
    * which is the streaming scale-killer. Content duplicates farther
    * apart than `lateness` are by-design out of scope here (that is
    * the batch dedup's job over the log). The fingerprint (32-byte
    * md5, null for null text) is computed BEFORE the watermark tag so
    * the projection can't drop it. */
  def dedupStream(
      docs: DataFrame,
      tsCol: String = "ts",
      textCol: String = "text",
      lateness: String = "10 minutes",
      idCol: String = "doc_id"): DataFrame =
    docs
      // null text has no content to be a duplicate OF — fall back to an
      // id-derived key so distinct null-text records all pass (null fp
      // would make dropDuplicates treat them as ONE key and silently
      // drop all but the first; review r7). Re-deliveries of the same
      // id still dedup. concat_ws, not concat: a null id must not null
      // the fallback itself (that would re-open the same hole one level
      // down) — a null-id null-text record keys on its event time, so
      // only exact re-deliveries collapse. idCol sits AFTER lateness so
      // existing positional callers keep their meaning.
      .withColumn("fp", coalesce(
        graft.functions.TextFns.fingerprint(col(textCol)),
        concat_ws(":", lit("null-text"), col(idCol).cast("string"),
          col(tsCol).cast("string"))))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming ingest NEAR-dup gate — the `foreachBatch` body that
    * puts [[graft.operators.Dedup.minhashNearDupsAgainst]] on the
    * ingest path: each micro-batch bands against the (static or
    * incrementally-maintained) corpus, and batch rows whose verified
    * Jaccard clears `threshold` are dropped before the sink. Exact
    * streaming dedup ([[dedupStream]]) catches byte-identical
    * re-deliveries in-stream; this gate catches the near-copies a
    * crawler re-fetches with new boilerplate — the two compose:
    * dedupStream upstream, this gate in `foreachBatch`.
    *
    * Scale contract is the batch-vs-corpus MinHash one: a daily shard
    * pays O(batch + corpus) through the single (band, bucket)
    * exchange, and production holds the corpus side as precomputed
    * sketches. Usage:
    * {{{
    * stream.writeStream.foreachBatch { (b, _) =>
    *   StreamingFeatures.nearDupGateBatch(b, corpus, "text", "doc_id")
    *     .write.mode("append").parquet(out)
    * }
    * }}}
    */
  def nearDupGateBatch(
      batch: DataFrame,
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.7): DataFrame = {
    val dups = graft.operators.Dedup
      .minhashNearDupsAgainst(batch, corpus, textCol, idCol,
        threshold = threshold)
      .select(col("id_a").as("__dup_id"))
      .distinct()
    batch.join(dups, col(idCol) === col("__dup_id"), "left_anti")
  }

  /** Streaming ingest SPAN-dup gate (r11) — the `foreachBatch` body
    * that puts the persisted span-hash index
    * ([[graft.operators.Dedup.spanDupStatsAgainst]]) on the ingest
    * path: batch docs whose duplicated-span ratio against the index
    * reaches `maxDupRatio` are dropped before the sink, and (by
    * default) the SURVIVORS' span deltas are appended to the index so
    * the next micro-batch dedups against them too — the full
    * index-maintaining ingest loop, closing the family triangle:
    * [[dedupStream]] = exact in-stream, [[nearDupGateBatch]] =
    * whole-doc near-dup, this = substring-level (Lee et al.).
    *
    * Scale contract: the batch pays its own explode+md5; the corpus
    * rides the probe as stored hashes+counts.
    *
    * DELIVERY (r12, closing the ADVICE r11 replay hole): foreachBatch
    * is at-least-once — if the sink write fails after the index
    * append committed, the micro-batch REPLAYS against an index that
    * already holds its own spans, every previously-kept doc
    * self-matches at dup_ratio 1.0, and the batch's novel docs are
    * silently dropped. So the gate is keyed by the foreachBatch
    * `batchId`: the probe EXCLUDES the batch's own `batch_id`
    * partition (a replay sees exactly the index the first attempt
    * saw), and the append OVERWRITES that partition (no
    * double-count). Replay is therefore idempotent end to end —
    * same gate decisions, same survivors, same deltas — under
    * foreachBatch's stable-batchId contract. Usage:
    * {{{
    * stream.writeStream.foreachBatch { (b, id) =>
    *   StreamingFeatures.spanGateBatch(b, "text", "doc_id", dir, id)
    *     .write.mode("append").parquet(out)
    * }
    * }}} */
  def spanGateBatch(
      batch: DataFrame,
      textCol: String,
      idCol: String,
      indexDir: String,
      batchId: Long,
      k: Int = 8,
      maxDupRatio: Double = 0.5,
      updateIndex: Boolean = true,
      compactEvery: Long = 0L): DataFrame = {
    // COMPACTION CADENCE (r15, VERDICT r14 #7): the gate appends one
    // file set per micro-batch forever — every `compactEvery` batches
    // fold the accumulated deltas into the batch_id=-1 base before the
    // probe's scan becomes a metadata storm. Runs BEFORE the batch's
    // probe/append and EXCLUDES the batch's own batch_id (the
    // maintainEvery placement, ADVICE r14): a replayed boundary
    // batch's prior-attempt partition is preserved verbatim — never
    // folded into the base where the probe's excludeBatchId could no
    // longer hide it (the batch would self-match at dup_ratio 1.0 and
    // silently vanish from the sink). Probe sums are associative, so
    // gate decisions are unchanged by the fold. 0 = off.
    if (updateIndex && compactEvery > 0L && batchId >= 0L &&
        (batchId + 1L) % compactEvery == 0L)
      graft.operators.Dedup.compactSpanIndex(batch.sparkSession,
        indexDir, excludeBatchId = Some(batchId))
    val dups = graft.operators.Dedup
      .spanDupStatsAgainst(batch, textCol, idCol, k, indexDir,
        excludeBatchId = Some(batchId),
        // within-batch copies must not ride in together: a span owned
        // by a LOWER-id batch doc counts as duplicated for the later
        // doc (keep-first; r12 review fix — the index probe alone
        // cannot see same-batch duplicates)
        includeBatchSelf = true)
      .filter(col("dup_ratio") >= maxDupRatio)
      .select(col(idCol).as("__dup_id"))
    val kept = batch.join(dups, col(idCol) === col("__dup_id"), "left_anti")
    if (!updateIndex) kept
    else {
      // pin the survivors once: the caller's sink write and the index
      // append must see the SAME rows (diamond DAGs recompute)
      val pinned = kept.localCheckpoint(false)
      graft.operators.Dedup
        .appendToSpanIndex(pinned, textCol, idCol, k, indexDir, batchId)
      pinned
    }
  }

  /** Streaming ingest near-dup gate against the PERSISTED band index
    * (r12) — [[nearDupGateBatch]] with the corpus-side sketch served
    * from [[graft.operators.Dedup.buildMinhashIndex]] storage instead
    * of recomputed per micro-batch (which re-paid the corpus
    * explode+hash — the dominant cost — every batch), PLUS the
    * index-maintaining loop: survivors' band rows append under the
    * batch's own partition so the NEXT micro-batch near-dups against
    * them too. This gives the MinHash family the same closed ingest
    * triangle the span family has (probe → gate → append), with the
    * same replay contract: the probe EXCLUDES the batch's own
    * `batch_id` (a replay sees the index the first attempt saw) and
    * the append OVERWRITES it — idempotent under foreachBatch's
    * stable-batchId delivery.
    *
    * WITHIN-BATCH duplicates (r12 review fix): the index probe alone
    * cannot see two near-copies arriving in the SAME micro-batch (the
    * batch's own bands are not in the index and its batch_id is
    * excluded) — so the gate also runs the batch SELF-join under the
    * index's pinned params and keeps the LOWEST id of each verified
    * pair (greedy keep-first, the [[semanticGateBatch]] policy; the
    * self-join is micro-batch-sized, not corpus-sized).
    *
    * `corpus` supplies only the TEXT for the exact-Jaccard verify
    * (candidate-restricted by the left-semi in the shared verify
    * stage) and MUST cover every doc the index knows: the BOOTSTRAP
    * corpus the index was built from UNIONED with the sink output,
    * constructed INSIDE the foreachBatch body — a frame captured once
    * before the stream starts snapshots its file listing, and a
    * sink-only corpus misses the bootstrap docs (ADVICE r12; the
    * verify now raises loudly on a candidate with no text instead of
    * silently verifying the duplicate away). On the FIRST micro-batch
    * the sink path may not exist yet — read it defensively. Usage:
    * {{{
    * stream.writeStream.foreachBatch { (b, id) =>
    *   val s = b.sparkSession
    *   val sunk = // fresh listing per batch; absent before batch 0
    *     try s.read.parquet(out)
    *     catch { case _: org.apache.spark.sql.AnalysisException =>
    *       bootstrapCorpus.limit(0) }
    *   StreamingFeatures.minhashGateBatch(b,
    *       bootstrapCorpus.select("doc_id", "text")
    *         .unionByName(sunk.select("doc_id", "text")),
    *       "text", "doc_id", dir, id)
    *     .write.mode("append").parquet(out)
    * }
    * }}} */
  def minhashGateBatch(
      batch: DataFrame,
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      indexDir: String,
      batchId: Long,
      threshold: Double = 0.7,
      updateIndex: Boolean = true,
      compactEvery: Long = 0L): DataFrame = {
    import graft.operators.Dedup
    // compaction cadence (r15, VERDICT r14 #7) — the spanGateBatch
    // hook: fold the per-batch band partitions into the base every
    // `compactEvery` micro-batches, BEFORE the probe and EXCLUDING the
    // batch's own batch_id (a replay's prior-attempt bands stay in
    // their own partition, visible to neither the fold nor the probe).
    // Band rows are distinct-preserving under the fold, so candidates
    // — and gate decisions — are unchanged. 0 = off.
    if (updateIndex && compactEvery > 0L && batchId >= 0L &&
        (batchId + 1L) % compactEvery == 0L)
      Dedup.compactMinhashIndex(batch.sparkSession, indexDir,
        excludeBatchId = Some(batchId))
    val idxDups = Dedup
      .minhashNearDupsAgainstIndex(batch, corpus, textCol, idCol,
        indexDir, threshold = threshold, excludeBatchId = Some(batchId))
      .select(col("id_a").as("__dup_id"))
    // within-batch near-dups under the SAME pinned hash family:
    // (id_a < id_b) pairs → drop the later id (keep-first)
    val (shingleN, bands, rows) =
      Dedup.minhashIndexMeta(batch.sparkSession, indexDir)
    val selfDups = Dedup
      .minhashNearDups(batch, textCol, idCol, shingleN, bands, rows,
        threshold = threshold)
      .select(col("id_b").as("__dup_id"))
    val dups = idxDups.unionByName(selfDups).distinct()
    val kept = batch.join(dups, col(idCol) === col("__dup_id"), "left_anti")
    if (!updateIndex) kept
    else {
      // pin the survivors once: the caller's sink write and the index
      // append must see the SAME rows (diamond DAGs recompute)
      val pinned = kept.localCheckpoint(false)
      graft.operators.Dedup
        .appendToMinhashIndex(pinned, textCol, idCol, indexDir, batchId)
      pinned
    }
  }

  /** Streaming SEMANTIC ingest gate (r12) — the `foreachBatch` body
    * that puts the persisted IVF index on the embedding-ingest path,
    * completing the dedup ingest quadrangle: [[dedupStream]] = exact,
    * [[minhashGateBatch]] = whole-doc lexical, [[spanGateBatch]] =
    * substring, this = SEMANTIC (SemDeDup at ingest). Batch vectors
    * whose cosine against the index — or against an EARLIER
    * (lower-id) batch member, the keep-one policy — reaches
    * `threshold` are dropped before the sink, and the SURVIVORS
    * append to the index under the frozen quantizer
    * ([[graft.operators.Similarity.appendToIvfIndex]]) so the next
    * micro-batch dedups against them too.
    *
    * Scale contract rides [[Similarity.semDedupAgainstIndex]]: the
    * index scan is partition-pruned to the batch's touched cells, the
    * batch side broadcasts, the corpus never re-clusters. Same replay
    * contract as the other gates: the probe EXCLUDES the batch's own
    * `batch_id` partition and the append OVERWRITES it — idempotent
    * under foreachBatch's stable-batchId delivery. Quantizer drift
    * (batches far from the training distribution) is the IVF append's
    * documented trade — and no longer only a doc-comment promise:
    * pass `maintainEvery = N` and every N micro-batches the gate runs
    * [[graft.operators.Similarity.maintainIvfIndex]] against the
    * index's pinned contract (r14, VERDICT r13 #7) — a bounded
    * monitor job when healthy, a locked staged retrain when drifted.
    * Usage:
    * {{{
    * stream.writeStream.foreachBatch { (b, id) =>
    *   StreamingFeatures.semanticGateBatch(b, "vec_id", "embedding",
    *       dir, id)
    *     .write.mode("append").parquet(out)
    * }
    * }}} */
  def semanticGateBatch(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      indexDir: String,
      batchId: Long,
      threshold: Double = 0.85,
      maxCell: Int = 2000,
      updateIndex: Boolean = true,
      maintainEvery: Long = 0L,
      compactEvery: Long = 0L): DataFrame = {
    // MAINTENANCE CADENCE (r14, VERDICT r13 #7; ORDER fixed r15,
    // ADVICE r14): every `maintainEvery` micro-batches the gate runs
    // the occupancy monitor against the index's own PINNED contract —
    // a bounded keyed count when healthy, a locked staged retrain
    // when the streamed distribution has drifted the frozen quantizer
    // past its cap. The hook runs BEFORE the batch's probe/append,
    // and the monitor AND rebuild EXCLUDE the batch's own batch_id:
    // the r14 after-append placement folded the boundary batch into
    // the batch_id=-1 base, where a crash before the checkpoint
    // commit left the REPLAY dedup'ing the batch against its own rows
    // (sim = 1 ≥ threshold → kept = ∅, the batch silently lost from
    // the sink). Run first-and-excluding, a replayed boundary batch's
    // retrain sees exactly what its first attempt saw, the prior
    // attempt's partition stays hidden from the probe, and the append
    // overwrite stays idempotent. 0 = off (the caller owns
    // maintenance).
    if (updateIndex && maintainEvery > 0L && batchId >= 0L &&
        (batchId + 1L) % maintainEvery == 0L)
      graft.operators.Similarity
        .maintainIvfIndex(batch.sparkSession, indexDir,
          excludeBatchId = Some(batchId))
    // compaction cadence (r15, VERDICT r14 #7 extended to this family):
    // fold the per-batch assigned partitions into the base every
    // `compactEvery` micro-batches, AFTER a same-boundary maintain (a
    // rebuild leaves nothing to fold) and BEFORE the probe/append,
    // EXCLUDING the batch's own batch_id — the preserved prior-attempt
    // partition keeps the probe exclusion and the overwrite idempotent
    // on replay. Probe results are fold-invariant (partition pruning
    // rides the cell layout, which the fold preserves). 0 = off.
    if (updateIndex && compactEvery > 0L && batchId >= 0L &&
        (batchId + 1L) % compactEvery == 0L)
      graft.operators.Similarity.compactIvfIndex(batch.sparkSession,
        indexDir, excludeBatchId = Some(batchId))
    val dups = graft.operators.Similarity
      .semDedupAgainstIndex(batch, indexDir, idCol, vecCol, threshold,
        maxCell = maxCell, excludeBatchId = Some(batchId))
      .select(col("id_b").as("__dup_id"))
      .distinct()
    val kept = batch.join(dups, col(idCol) === col("__dup_id"), "left_anti")
    if (!updateIndex) kept
    else {
      // pin the survivors once: the caller's sink write and the index
      // append must see the SAME rows (diamond DAGs recompute)
      val pinned = kept.localCheckpoint(false)
      graft.operators.Similarity
        .appendToIvfIndex(pinned, idCol, vecCol, indexDir, batchId)
      pinned
    }
  }

  /** Streaming keyword-index maintenance (r12, VERDICT r11 #6) — the
    * `foreachBatch` body that keeps a served
    * [[graft.operators.Retrieval.buildKeywordIndex]] BM25/tf-idf index
    * current per micro-batch: the batch's postings/doclens/totals
    * deltas append under the batch's own `batch_id` partition, and
    * the SAME pinned rows return for the caller's sink write. Probes
    * ([[graft.operators.Retrieval.bm25SearchFromIndex]]) see the new
    * docs from the next read on — df and totals fold from the deltas,
    * so ranking stays consistent with a full rebuild over everything
    * ingested (the q_bm25_index oracle's invariant).
    *
    * DELIVERY: the append OVERWRITES its `batch_id` partition, so an
    * at-least-once replay replaces — never double-counts — its own
    * tf/dl/totals deltas: idempotent under foreachBatch's
    * stable-batchId contract. Unlike [[spanGateBatch]] there is no
    * probe-before-write here, so no self-match exclusion is needed.
    * Usage:
    * {{{
    * stream.writeStream.foreachBatch { (b, id) =>
    *   StreamingFeatures.keywordIndexBatch(b, "text", "doc_id", dir, id)
    *     .write.mode("append").parquet(out)
    * }
    * }}} */
  def keywordIndexBatch(
      batch: DataFrame,
      textCol: String,
      idCol: String,
      indexDir: String,
      batchId: Long,
      compactEvery: Long = 0L): DataFrame = {
    // compaction cadence (r15, VERDICT r14 #7): fold the per-batch
    // postings/doclens/totals deltas into the base every
    // `compactEvery` micro-batches, BEFORE the batch's append and
    // EXCLUDING its batch_id — a replay's prior-attempt deltas stay
    // in their own partition, which the replay's overwrite replaces
    // (folded into the base they would double-count). df/dl/totals
    // folds are sum-associative, so probe scores are unchanged.
    // 0 = off.
    if (compactEvery > 0L && batchId >= 0L &&
        (batchId + 1L) % compactEvery == 0L)
      graft.operators.Retrieval.compactKeywordIndex(batch.sparkSession,
        indexDir, idCol, excludeBatchId = Some(batchId))
    // pin once: the index append and the caller's sink write must see
    // the same rows (diamond DAGs recompute)
    val pinned = batch.localCheckpoint(false)
    graft.operators.Retrieval
      .appendToKeywordIndex(pinned, idCol, textCol, indexDir, batchId)
    pinned
  }

  /** Streaming PQ-index maintenance (r12) — the `foreachBatch` body
    * that keeps a served [[graft.operators.Similarity.buildPqIndex]]
    * ANN index current per micro-batch: the batch encodes under the
    * FROZEN persisted codebooks and its m-byte codes land under the
    * batch's own `batch_id` partition (the
    * [[graft.operators.Similarity.appendToPqIndex]] contract — never
    * a corpus re-encode), while the SAME pinned rows return for the
    * caller's sink write. With [[semanticGateBatch]] (IVF),
    * [[keywordIndexBatch]], [[spanGateBatch]] and
    * [[minhashGateBatch]], every persisted index family now has its
    * streaming-maintenance member. Replay: the append OVERWRITES its
    * `batch_id` partition — idempotent under foreachBatch's
    * stable-batchId delivery; no probe-before-write here, so no
    * self-match exclusion is needed. */
  def pqIndexBatch(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      indexDir: String,
      batchId: Long,
      compactEvery: Long = 0L): DataFrame = {
    // compaction cadence (r15, VERDICT r14 #7): fold the per-batch
    // code partitions into the base every `compactEvery` micro-batches,
    // BEFORE the batch's append and EXCLUDING its batch_id (the
    // keywordIndexBatch rationale — a base-folded prior attempt would
    // double-count under the replay's overwrite). Codes ride the fold
    // verbatim, so probes are unchanged. 0 = off.
    if (compactEvery > 0L && batchId >= 0L &&
        (batchId + 1L) % compactEvery == 0L)
      graft.operators.Similarity.compactPqIndex(batch.sparkSession,
        indexDir, excludeBatchId = Some(batchId))
    // pin once: the index append and the caller's sink write must see
    // the same rows (diamond DAGs recompute)
    val pinned = batch.localCheckpoint(false)
    graft.operators.Similarity
      .appendToPqIndex(pinned, idCol, vecCol, indexDir, batchId)
    pinned
  }

  /** Streaming k-NN-graph-index maintenance (r13) — the `foreachBatch`
    * body that keeps a served
    * [[graft.operators.Similarity.buildKnnGraphIndex]] graph current
    * per micro-batch: the batch assigns under the FROZEN persisted
    * quantizer, folds its heap delta against ONLY its touched cells'
    * partitions (the [[graft.operators.Similarity.appendToKnnGraphIndex]]
    * contract — never a corpus retrain or re-assignment, VERDICT r12
    * #1), and the SAME pinned rows return for the caller's sink
    * write. Serves ([[graft.operators.Similarity.knnGraphFromIndex]])
    * see the new nodes — and existing nodes' updated heaps — from the
    * next read on. Replay: the append reads the index MINUS its own
    * `batch_id` and OVERWRITES both its partitions — idempotent under
    * foreachBatch's stable-batchId delivery; no probe-before-write
    * gate here, so no self-match exclusion is needed beyond that. */
  def knnGraphIndexBatch(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      indexDir: String,
      batchId: Long,
      maintainEvery: Long = 0L,
      compactEvery: Long = 0L): DataFrame = {
    // maintenance cadence (r14, VERDICT r13 #7) — the semanticGateBatch
    // hook for the graph family: every `maintainEvery` micro-batches,
    // monitor occupancy against the index's pinned (k, maxCell) and
    // staged-retrain under the lock when drifted; monitor-only when
    // healthy, 0 = off. Runs BEFORE the batch's append and EXCLUDES
    // the batch's own batch_id (r15, ADVICE r14): the r14 after-append
    // placement folded the boundary batch into the batch_id=-1 base,
    // so a replay's own append DUPLICATED its members (the append
    // reads the index minus its batch_id — a base-folded copy is
    // invisible to that exclusion).
    if (maintainEvery > 0L && batchId >= 0L &&
        (batchId + 1L) % maintainEvery == 0L)
      graft.operators.Similarity
        .maintainKnnGraphIndex(batch.sparkSession, indexDir,
          excludeBatchId = Some(batchId))
    // compaction cadence (r15, VERDICT r14 #7 extended to this
    // family): fold assigned + graph delta partitions into their
    // bases every `compactEvery` micro-batches, after a
    // same-boundary maintain and before the append, excluding the
    // batch's own batch_id — serve results are fold-invariant by the
    // heap associativity the fold itself rides. 0 = off.
    if (compactEvery > 0L && batchId >= 0L &&
        (batchId + 1L) % compactEvery == 0L)
      graft.operators.Similarity.compactKnnGraphIndex(
        batch.sparkSession, indexDir, excludeBatchId = Some(batchId))
    // pin once: the index append and the caller's sink write must see
    // the same rows (diamond DAGs recompute)
    val pinned = batch.localCheckpoint(false)
    graft.operators.Similarity
      .appendToKnnGraphIndex(pinned, idCol, vecCol, indexDir, batchId)
    pinned
  }

  def maintainLatest(features: DataFrame, outDir: String,
      checkpoint: String, entityKey: String,
      tsCol: String = "ts", tieBreak: Seq[String] = Seq.empty)
      : DataStreamWriter[Row] =
    features.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        maintainLatestEpoch(batch, outDir, entityKey, tsCol, tieBreak)
      }

  /** The per-epoch fold of [[maintainLatest]], exposed for direct
    * testing (same pattern as [[writeEpoch]]).
    *
    * CRASH SAFETY: a plain overwrite deletes the old table before the
    * new write commits — a crash in that window would silently reset
    * the serving table to just the replayed batch. So versions are
    * immutable: each epoch writes a fresh `v_<n>` subdirectory and
    * then atomically swaps the `_CURRENT` pointer file (temp +
    * ATOMIC_MOVE, the catalog's protocol); readers resolve the pointer
    * via [[readLatestTable]]. A crash mid-epoch leaves the pointer on
    * the previous complete version. The predecessor version is kept
    * for in-flight readers; older ones are pruned. */
  def maintainLatestEpoch(batch: DataFrame, outDir: String,
      entityKey: String, tsCol: String = "ts",
      tieBreak: Seq[String] = Seq.empty): Unit = {
    val spark = batch.sparkSession
    val base = new org.apache.hadoop.fs.Path(outDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prev = currentVersion(spark, outDir).map(v =>
      spark.read.parquet(s"$outDir/v_$v"))
    val folded = prev match {
      case Some(p) => graft.fs.Serving.refreshLatest(
        p, batch, entityKey, tsCol, tieBreak.map(col))
      case None => graft.fs.Serving.latestAsOf(
        batch, entityKey, tsCol, None, tieBreak.map(col))
    }
    val next = currentVersion(spark, outDir).getOrElse(-1) + 1
    folded.localCheckpoint(true)
      .write.mode("overwrite").parquet(s"$outDir/v_$next")
    // atomic pointer swap: readers never see a half-written version,
    // and the swap itself is ONE overwriting rename — a delete-then-
    // rename pair would leave a window with no _CURRENT at all, after
    // which the next epoch would silently reset the table to just its
    // own batch (ADVICE r6). FileContext.rename(OVERWRITE) throws on
    // failure instead of returning an ignorable boolean.
    val tmp = new org.apache.hadoop.fs.Path(base, s"_CURRENT.tmp$next")
    val out = fs.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    val cur = new org.apache.hadoop.fs.Path(base, "_CURRENT")
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      base.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, cur, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // prune all but the current + predecessor versions, plus any stale
    // pointer temp files a crashed epoch left behind
    fs.listStatus(base).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("v_") && n.stripPrefix("v_").toLongOption.exists(_ < next - 1))
        fs.delete(st.getPath, true)
      else if (n.startsWith("_CURRENT.tmp") &&
          n.stripPrefix("_CURRENT.tmp").toLongOption.exists(_ < next))
        fs.delete(st.getPath, false)
    }
  }

  /** The version the `_CURRENT` pointer names, if a complete one exists. */
  private def currentVersion(spark: SparkSession, outDir: String): Option[Int] = {
    val cur = new org.apache.hadoop.fs.Path(outDir, "_CURRENT")
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(cur)) None
    else {
      val len = fs.getFileStatus(cur).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(cur)
      try { in.readFully(buf); new String(buf, "UTF-8").trim.toIntOption }
      finally in.close()
    }
  }

  /** Read the serving table [[maintainLatest]] maintains (resolves the
    * `_CURRENT` pointer). Empty option = no complete epoch yet. */
  def readLatestTable(spark: SparkSession, outDir: String): Option[DataFrame] =
    currentVersion(spark, outDir).map(v => spark.read.parquet(s"$outDir/v_$v"))

  /** The idempotent per-epoch write, exposed for direct testing (a
    * foreachBatch body re-running with the same epochId must leave the
    * table unchanged).
    *
    * PRECONDITION — deterministic replay: dynamic partition overwrite
    * rewrites only the (p_date, p_epoch) partitions present in THIS
    * batch. Idempotence therefore requires the replayed epoch to emit
    * the same p_date set as the first attempt — true for replayable
    * sources (files, Kafka) with deterministic transforms, which is
    * the contract Structured Streaming's epoch replay assumes anyway.
    * A nondeterministic transform that shifts rows across dates could
    * leave a first-attempt (p_date, p_epoch) partition orphaned as
    * duplicates (ADVICE r5). */
  def writeEpoch(batch: DataFrame, epochId: Long, outDir: String): Unit =
    batch
      .withColumn("p_date", to_date(col("ts")))
      .withColumn("p_epoch", lit(epochId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("p_date", "p_epoch")
      .parquet(outDir)
}
