package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Physical-plan shape checks — the 100 TB posture (SURVEY.md §7.3)
  * verified structurally, since the harness only runs sf ≤ 0.1:
  * dimension joins must broadcast, scans must push filters and prune
  * columns, and nothing in the declared query set may plan a cartesian
  * product (the one deliberate broadcast-nested-loop is the brute-force
  * ANN, which is |queries|-bounded by contract).
  */
class PlanSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  test("q_join_regions broadcasts the nation/region dims") {
    val plan = physical(run("q_join_regions"))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val scan = run("q1_agg").queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"expected pushed filter in:\n$scan")
  }

  test("projection prunes scan columns to those referenced") {
    val df = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"expected 2-column ReadSchema in:\n$scan")
  }

  test("no declared query plans a cartesian product") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = physical(fn(spark, sf))
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }

  test("semi/anti joins plan as semi/anti, not materialized subqueries") {
    assert(physical(run("q_semi_join")).contains("LeftSemi"))
    assert(physical(run("q_anti_join")).contains("LeftAnti"))
  }

  test("bloom prefilter runs below the big side's first exchange") {
    // The whole point of q_bloom_semi: non-candidate rows die map-side.
    // Structurally: a Filter containing might_contain sits on the scan
    // side of every Exchange in the plan (never above one).
    val plan = run("q_bloom_semi").queryExecution.executedPlan
    val filters = collect(plan) {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("might_contain") => f
    }
    assert(filters.nonEmpty, s"no might_contain filter in:\n$plan")
    filters.foreach { f =>
      val below = collect(f.child) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(below.isEmpty,
        s"bloom prefilter planned ABOVE a shuffle — prefilter is wasted:\n$plan")
    }
  }

  test("pit latest aggregates top-1 map-side (no window, no history shuffle)") {
    // latestAsOf = max_by aggregate: partial aggregation runs before
    // the exchange, so the shuffle carries ≤1 row per entity per input
    // partition — a window (even group-limited) would shuffle the full
    // history first
    val plan = physical(run("q_pit_latest"))
    assert(!plan.contains("Window"), s"pit latest still plans a window:\n$plan")
    assert(plan.contains("partial_max_by"),
      s"no map-side partial max_by in:\n$plan")
  }

  test("per-row as-of PIT: one window for all groups, never a nested loop") {
    // asOfJoinMulti's whole point: BOTH feature groups fill over a
    // single window spec — Catalyst plans ONE Window node (two last()
    // expressions), one exchange+sort, however many groups there are.
    // A theta-join formulation (r.ts <= l.ts) would plan a
    // BroadcastNestedLoopJoin that cross-multiplies at scale.
    val plan = physical(run("q_pit_asof_perrow"))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"per-row as-of degenerated to a nested loop:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    val windows = "\\bWindow\\b".r.findAllIn(plan).length
    assert(windows == 1, s"expected exactly 1 Window node, got $windows:\n$plan")
  }

  test("sharded packing exchanges on (group, shard), not group alone") {
    // The whole point of the r6 rework: the repartition key must carry
    // the shard so parallelism is #groups × #shards.
    val plan = physical(run("q_pack_sharded"))
    assert(plan.contains("hashpartitioning(source") && plan.contains("shard"),
      s"expected a (source, shard) exchange in:\n$plan")
  }

  test("stable ids: data-sized work never crosses a SinglePartition exchange") {
    // StableIds' whole point: the naive row_number() OVER (ORDER BY ...)
    // serializes the dataset through ONE task. The two-phase plan may
    // single-partition only the AGGREGATED bucket-count frame (tiny);
    // the data-sized side must ride a hash exchange on the bucket and
    // a broadcast join back.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val df = run("q_stable_ids")
    df.count() // materialize so AQE finalizes the plan
    val plan = physical(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"offsets must broadcast back:\n$plan")
    val singles = collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeLike
          if s.outputPartitioning.numPartitions == 1 => s
    }
    // the one legal SinglePartition sits above the bucket-count
    // aggregate — its input is an agg, never a scan
    singles.foreach { s =>
      val sub = s.toString
      assert(sub.contains("HashAggregate") || sub.contains("SortAggregate"),
        s"SinglePartition exchange over non-aggregated data:\n$sub")
    }
  }

  test("top-k queries use the bounded aggregate, not a per-query window") {
    // A Window.partitionBy(query_id) would funnel every scored corpus
    // row for a query into one task; the BoundedTopK aggregate keeps
    // partial aggregation map-side (≤ k rows per partition per query).
    Seq("q_cosine_topk", "q_ann_bucketed").foreach { name =>
      val plan = physical(run(name))
      assert(!plan.contains("Window"), s"$name still plans a Window:\n$plan")
      assert(plan.contains("top_k"), s"$name lost the top_k aggregate:\n$plan")
      assert(plan.contains("partial_top_k"),
        s"$name does not partial-aggregate top_k map-side:\n$plan")
    }
  }

  test("bucketed join shuffles neither fact table") {
    // Both sides bucketed by the join key into the same bucket count →
    // the sort-merge join takes bucket partitioning straight from the
    // scans, with ZERO exchanges. Broadcast is disabled for the
    // assertion: at sf0.001 Catalyst (correctly) prefers broadcasting
    // the tiny orders side, which would bypass the property under test
    // — at fact-to-fact scale, neither side broadcasts and this
    // shuffle-free shape is the one that runs.
    val tag = sf.replaceAll("[^A-Za-z0-9]", "_")
    val o = graft.sources.Bucketing.ensureBucketed(spark,
      Tables.orders(spark, sf), s"graft_orders_$tag",
      s"/tmp/graft_buckets/$tag/orders", "o_orderkey", 8)
    val l = graft.sources.Bucketing.ensureBucketed(spark,
      Tables.lineitem(spark, sf)
        .select(org.apache.spark.sql.functions.col("l_orderkey"),
          org.apache.spark.sql.functions.col("l_quantity"),
          org.apache.spark.sql.functions.col("l_extendedprice")),
      s"graft_lineitem_$tag",
      s"/tmp/graft_buckets/$tag/lineitem", "l_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = l.join(o,
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      df.collect() // AQE: final plan only materializes after execution
      val shuffles = collectWithSubqueries(df.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed fact-to-fact join must not shuffle:\n${physical(df)}")
      assert(physical(df).contains("SelectedBucketsCount"),
        s"join does not read bucketed scans:\n${physical(df)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed record log serves latestAsOf with zero exchanges") {
    // The serving composition of the same property: records written
    // bucketed by the entity key give the PIT aggregate its clustering
    // straight from the scan — the latest-per-entity read of a 100 TB
    // log costs no shuffle at all.
    val tag = sf.replaceAll("[^A-Za-z0-9]", "_")
    val records = graft.sources.Bucketing.ensureBucketed(spark,
      Tables.events(spark, sf).select(
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("value")),
      s"graft_serve_log_$tag",
      s"/tmp/graft_buckets/$tag/serve_log", "user_id", 8)
    val served = graft.fs.Serving.latestAsOf(records, "user_id", "ts",
      None, Seq(org.apache.spark.sql.functions.col("event_id")))
    served.collect() // AQE: final plan materializes after execution
    val shuffles = collectWithSubqueries(served.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"bucketed PIT serve must not shuffle:\n${physical(served)}")
  }

  test("tuple-bucketed record log serves composite-key latestAsOf with zero exchanges") {
    // The composite-key generalization (tenant, entity)-style stores
    // need: bucketing by the FULL key tuple hands the serve aggregate
    // HashPartitioning(user_id, event_type) straight from the scan, so
    // the latest-per-(key tuple) read — the path q_pit_composite's
    // union-tag window pays an exchange + full sort for — costs no
    // shuffle at all when the log is laid out for it.
    val tag = sf.replaceAll("[^A-Za-z0-9]", "_")
    val records = graft.sources.Bucketing.ensureBucketed(spark,
      Tables.events(spark, sf).select(
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("value")),
      s"graft_serve_log_comp_$tag",
      s"/tmp/graft_buckets/$tag/serve_log_comp",
      Seq("user_id", "event_type"), 8)
    val served = graft.fs.Serving.latestAsOf(records,
      Seq("user_id", "event_type"), "ts", None,
      Seq(org.apache.spark.sql.functions.col("event_id")))
    served.collect() // AQE: final plan materializes after execution
    val shuffles = collectWithSubqueries(served.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"tuple-bucketed composite PIT serve must not shuffle:\n${physical(served)}")
  }

  test("snapshotDiff joins the two serves with no additional exchange") {
    // both serves aggregate on the SAME entity key, so the full-outer
    // join's distribution requirement is already satisfied — exactly
    // the two serve exchanges appear, never a third for the join
    import org.apache.spark.sql.functions.{col, to_timestamp, lit}
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"))
    val diff = graft.fs.Serving.snapshotDiff(e, e, "user_id", "ts",
      to_timestamp(lit("2024-01-15 00:00:00")),
      to_timestamp(lit("2024-03-01 00:00:00")),
      Seq(col("event_id")), Seq("event_id"))
    diff.collect() // AQE: final plan materializes after execution
    // the loader's round-robin rebalance (REPARTITION_BY_NUM) is a
    // small-testdata artifact — count only requirement-driven shuffles
    val shuffles = collectWithSubqueries(diff.queryExecution.executedPlan) {
      case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if x.shuffleOrigin ==
          org.apache.spark.sql.execution.exchange.ENSURE_REQUIREMENTS => x
    }
    assert(shuffles.size <= 2,
      s"diff must reuse the serve partitioning:\n${physical(diff)}")
  }

  test("whole-stage codegen covers the aggregation hot path") {
    // AQE only materializes the final (codegen'd) plan after execution;
    // the short toString renders spans as "*(n)", so check structurally.
    val df = run("q1_agg")
    df.collect()
    val spans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, s"no codegen span in:\n${physical(df)}")
  }

  test("random projection is map-side: zero exchanges before any sort") {
    // the sign matrix rides the plan as a literal; per row the work is
    // outDim integer dots — no shuffle may appear
    val df = Tables.embeddings(spark, sf).select(
      org.apache.spark.sql.functions.col("vec_id"),
      graft.functions.VectorFns.randomProject(
        org.apache.spark.sql.functions.col("embedding"), 64, 8, "rp"))
    df.collect()
    // the loader's deliberate round-robin rebalance (single-row-group
    // testdata) is not the projection's doing — count only the
    // shuffles the PLAN required
    val shuffles = collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.shuffleOrigin ==
          org.apache.spark.sql.execution.exchange.ENSURE_REQUIREMENTS => e
    }
    assert(shuffles.isEmpty,
      s"projection must not shuffle:\n${physical(df)}")
  }

  test("no declared query plans an unbounded single-partition window") {
    // The class of bug behind the r9 weak flags (q_rfm, q_rrf_fusion):
    // Window.orderBy(...) with NO partitionBy requires SinglePartition
    // distribution — the window's entire input serializes through one
    // task's sort. That is fine when the input is provably bounded (an
    // aggregate output, or a limit/top-k head); it is a scale-killer
    // when the input is data-sized. Gate: every empty-partitionSpec
    // WindowExec must have an aggregate or a limit somewhere below it.
    // "Bounded below" means: a LIMIT (any flavor — the limit-then-rank
    // idiom), a GLOBAL aggregate (1 row), or a KEYED aggregate whose
    // grouping key is audited bounded-cardinality. A keyed aggregate
    // alone does NOT bound — groupBy(user_id) is data-sized at 10⁹
    // users, which is exactly how q_rfm slipped through r9. Audited
    // keys: `__bucket` (the StableIds offsets frame — #buckets rows by
    // construction), q_daily_anomaly's calendar-day key (one row per
    // day of history), and q_auc's 6-dp-rounded [0,1] score key
    // (≤ 10⁶+1 rows at any corpus size — precision-bounded, and since
    // r11 ENFORCED by the operator itself: Eval.aucRankSum raise_errors
    // on any out-of-[0,1] score, so the whitelist entry records a
    // property the operator guarantees, not one the caller promises).
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.{GlobalLimitExec,
      LocalLimitExec, TakeOrderedAndProjectExec, CollectLimitExec}
    import org.apache.spark.sql.execution.window.WindowExec
    val auditedKeyedAggQueries = Set("q_daily_anomaly", "q_auc")
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan
      val unbounded = collectWithSubqueries(plan) {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }.filter { w =>
        val limits = collectWithSubqueries(w.child) {
          case l: GlobalLimitExec => l: Any
          case l: LocalLimitExec => l: Any
          case t: TakeOrderedAndProjectExec => t: Any
          case c: CollectLimitExec => c: Any
        }
        val aggs = collectWithSubqueries(w.child) {
          case a: BaseAggregateExec => a
        }
        val bounded = limits.nonEmpty ||
          aggs.exists(a => a.groupingExpressions.isEmpty ||
            a.groupingExpressions.forall(_.sql.contains("__bucket"))) ||
          (aggs.nonEmpty && auditedKeyedAggQueries(name))
        !bounded
      }
      if (unbounded.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"data-sized single-partition windows in: ${offenders.sorted.mkString(", ")}")
  }

  test("no declared query funnels unbounded data through a SinglePartition exchange") {
    // The exchange-level generalization of the window gate: ANY
    // SinglePartition shuffle whose input is not aggregate- or
    // limit-bounded serializes data-sized rows through one task —
    // whether a window, a global sort, or a coalesce(1) consumes it.
    // Green across all declared queries as of r10; this pins it.
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.{GlobalLimitExec,
      LocalLimitExec, TakeOrderedAndProjectExec, CollectLimitExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan
      val unbounded = collectWithSubqueries(plan) {
        case s: ShuffleExchangeLike
            if s.outputPartitioning.numPartitions == 1 => s
      }.filter { s =>
        collectWithSubqueries(s.child) {
          case a: BaseAggregateExec => a: Any
          case l: GlobalLimitExec => l: Any
          case l: LocalLimitExec => l: Any
          case t: TakeOrderedAndProjectExec => t: Any
          case c: CollectLimitExec => c: Any
        }.isEmpty
      }
      if (unbounded.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unbounded SinglePartition exchanges in: ${offenders.sorted.mkString(", ")}")
  }

  test("low-cardinality-partition rewrites window only on StableIds buckets") {
    // The generic gate above cannot see a LOW-CARDINALITY partition
    // key (a window partitioned by the 2-value epoch column, the
    // 5-value source column, or the ~30-value day column is one task
    // per partition value — r9 #3 and the r10 plan audit); lock the
    // fixed shapes: every window in these queries must either carry
    // the StableIds `__bucket` (in its partition or order spec) or be
    // partitioned by the query's audited high-cardinality key.
    import org.apache.spark.sql.execution.window.WindowExec
    val pinned: Seq[(String, Set[String])] = Seq(
      "q_epoch_shuffle" -> Set(),
      "q_rfm" -> Set(),
      "q_quality_buckets" -> Set(),
      "q_head_mass" -> Set(),
      "q_score_calibration" -> Set(),
      "q_histogram_depth" -> Set(),
      "q_concurrency" -> Set("user_id")) // the sessionize windows
    for ((name, highCard) <- pinned) {
      val plan = run(name).queryExecution.executedPlan
      val windows = collectWithSubqueries(plan) { case w: WindowExec => w }
      assert(windows.nonEmpty, s"$name lost its StableIds windows")
      windows.foreach { w =>
        val spec = w.partitionSpec.map(_.sql).mkString(",")
        val ord = w.orderSpec.map(_.sql).mkString(",")
        assert(spec.contains("__bucket") || ord.contains("__bucket") ||
          highCard.exists(spec.contains),
          s"$name windows outside a StableIds bucket: [$spec | $ord]\n$plan")
      }
    }
  }

  test("champion-selection aggregates never window the raw stream") {
    // preference pairs and majority vote fold via max/min-by struct
    // aggregates; a WindowExec would mean the raw rows are being
    // sorted per key — the skew shape these ops exist to avoid
    for (name <- Seq("q_preference_pairs", "q_majority_vote")) {
      val df = run(name)
      df.collect()
      val windows = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.isEmpty,
        s"$name must not plan a window:\n${physical(df)}")
    }
  }

  test("bm25 broadcasts the query terms against the corpus tokens") {
    val df = run("q_bm25")
    df.collect()
    assert(physical(df).contains("BroadcastHashJoin"),
      s"terms join must broadcast:\n${physical(df)}")
  }

  test("q_bm25_index pushes the query-term IN filter into the postings scan (r11)") {
    // The point of the persisted index: the probe reads only the query
    // terms' postings — the In(term, …) filter must reach the parquet
    // scan (term-sorted layout → row-group pruning), not evaluate
    // post-scan over the whole postings table.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = run("q_bm25_index")
    df.collect()
    val postingsScans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("postings")) => s
    }
    assert(postingsScans.nonEmpty, s"no postings scan:\n${physical(df)}")
    assert(postingsScans.forall(_.metadata.getOrElse("PushedFilters", "")
        .contains("In(term")),
      s"term IN-filter not pushed:\n${postingsScans.map(_.metadata).mkString}")
  }

  test("q_bm25_index doclens joins as the streamed side of a broadcast — " +
      "never a corpus-sized exchange (r12, VERDICT r11 #2)") {
    // doclens is the corpus-sized stored table; the candidate side
    // (query terms' postings) is the bounded one. The DECLARED plan —
    // not an AQE rescue — must broadcast the candidate side: any
    // shuffle-based join over doclens means the pre-AQE plan
    // exchanges the whole corpus on idCol.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.{
      BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    def leavesHaveDoclens(p: org.apache.spark.sql.execution.SparkPlan) =
      p.collectLeaves().exists {
        case s: FileSourceScanExec =>
          s.relation.location.rootPaths.exists(_.toString.contains("doclens"))
        case _ => false
      }
    val df = run("q_bm25_index")
    df.collect()
    val plan = df.queryExecution.executedPlan
    val shuffledJoins = collectWithSubqueries(plan) {
      case j: SortMergeJoinExec if leavesHaveDoclens(j) => j
      case j: ShuffledHashJoinExec if leavesHaveDoclens(j) => j
    }
    assert(shuffledJoins.isEmpty,
      s"doclens rode a shuffle join:\n${physical(df)}")
    val broadcastJoins = collectWithSubqueries(plan) {
      case j: BroadcastHashJoinExec if leavesHaveDoclens(j) => j
    }
    assert(broadcastJoins.nonEmpty,
      s"no broadcast join over doclens found:\n${physical(df)}")
  }

  test("in-plan bm25Search rides the measured candidate dial: " +
      "broadcast below it, shuffle join above it, same scores (r13, " +
      "ADVICE r12)") {
    // the index probe got the measured candBound fallback in r12; the
    // in-plan variant broadcast unconditionally — a stopword-grade
    // query term makes tfq corpus-sized and kills the driver where a
    // shuffle join completes. Both sides of the dial must score
    // identically; the plans must differ in the dl-join's exchange.
    import org.apache.spark.sql.execution.joins.{
      ShuffledHashJoinExec, SortMergeJoinExec}
    val docs = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 200)
    val terms = Seq("vector", "hash")
    def runSearch(dial: Long) = graft.operators.Retrieval.bm25Search(
      docs, "doc_id", "text", terms, 10, maxBroadcastCandidates = dial)
    assert(runSearch(4000000L).collect().toSeq ==
      runSearch(0L).collect().toSeq, "the dial changed scores")
    // plan shape on FRESH un-executed instances: the DECLARED plan is
    // the contract (AQE may rescue the small test shuffle into a
    // broadcast after execution — at corpus scale it would not), and
    // size-based auto-broadcast is disabled so only the operator's
    // explicit hint decides (at corpus scale the size estimate would
    // not qualify either)
    def shuffleJoins(df: org.apache.spark.sql.DataFrame) =
      collectWithSubqueries(df.queryExecution.executedPlan) {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thresholdKey)
    try {
      spark.conf.set(thresholdKey, "-1")
      val bcast = runSearch(4000000L)
      val shuffled = runSearch(0L)
      assert(shuffleJoins(bcast).isEmpty,
        s"below the dial every join must broadcast:\n${physical(bcast)}")
      assert(shuffleJoins(shuffled).nonEmpty,
        s"above the dial the dl join must shuffle, not broadcast:\n" +
          physical(shuffled))
    } finally spark.conf.set(thresholdKey, prev)
  }

  test("q_semdedup_append prunes the assigned scan to touched cells " +
      "and broadcasts the batch side of the pair join (r12)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val df = run("q_semdedup_append")
    df.collect()
    val cartesians = collectWithSubqueries(df.queryExecution.executedPlan) {
      case c: CartesianProductExec => c
    }
    assert(cartesians.isEmpty, s"cartesian crept in:\n${physical(df)}")
    assert(physical(df).contains("BroadcastHashJoin"),
      s"pair join must broadcast the batch side:\n${physical(df)}")
    // cell partition pruning is asserted on the operator's OWN
    // membership frame (the declared query's localCheckpoint pins
    // sever the assigned scan from the final executed plan) — the
    // query above just built+appended the index at this sf's dir
    val tag = sf.replaceAll("[^A-Za-z0-9]", "_")
    val members = graft.operators.Similarity.semDedupIndexMembers(
      graft.Tables.embeddings(spark, sf)
        .filter(org.apache.spark.sql.functions.col("vec_id") < 50),
      s"/tmp/graft_semdedup_append/$tag", "vec_id", "embedding",
      maxCell = 2048, excludeBatchId = Some(0L))
    members.collect()
    val assignedScans = collectWithSubqueries(
        members.queryExecution.executedPlan) {
      case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(
            _.toString.contains("assigned")) => s
    }
    assert(assignedScans.nonEmpty, s"no assigned scan:\n" +
      members.queryExecution.executedPlan.toString)
    assert(assignedScans.forall(s =>
        s.metadata.getOrElse("PartitionFilters", "").contains("cell") &&
        s.metadata.getOrElse("PartitionFilters", "").contains("batch_id")),
      s"cell/batch_id partition filters not applied:\n" +
        assignedScans.map(_.metadata).mkString)
  }

  test("q_knn_append's refresh: the ONLY file scan is the assigned " +
      "table pruned to touched cells and minus the batch's own " +
      "partition — no corpus retrain, no corpus re-assignment (r13)") {
    // VERDICT r12 #1's done-criterion: the r12 in-memory refresh paid
    // a kmeansFit corpus retrain + a full-corpus map-side assignment
    // per refresh. The index path must pay NEITHER — its membership
    // frame's only file input is the cell/batch_id-PRUNED assigned
    // scan (centroids are a bounded driver collect, the batch is a
    // pinned micro-batch). Asserted on the operator's OWN membership
    // frame (knnGraphIndexMembers — the exact code path the append
    // runs) because the localCheckpoint pins sever it from the
    // declared query's final executed plan; the no-cartesian check
    // stays on the full declared plan.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val df = run("q_knn_append")
    df.collect()
    val cartesians = collectWithSubqueries(df.queryExecution.executedPlan) {
      case c: CartesianProductExec => c
    }
    assert(cartesians.isEmpty, s"cartesian crept in:\n${physical(df)}")
    // the query above just rebuilt the index at this sf's dir
    val tag = sf.replaceAll("[^A-Za-z0-9]", "_")
    val members = graft.operators.Similarity.knnGraphIndexMembers(
      graft.Tables.embeddings(spark, sf)
        .filter(org.apache.spark.sql.functions.col("vec_id") < 50),
      s"/tmp/graft_knn_append/$tag", "vec_id", "embedding",
      excludeBatchId = Some(0L))
    members.collect()
    val scans = collectWithSubqueries(
        members.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, s"no file scan found:\n" +
      members.queryExecution.executedPlan.toString)
    assert(scans.forall(_.relation.location.rootPaths.exists(
        _.toString.contains("assigned"))),
      s"refresh read a non-index file (corpus-sized input crept in):\n" +
        scans.map(_.relation.location.rootPaths.mkString).mkString("\n"))
    assert(scans.forall(s =>
        s.metadata.getOrElse("PartitionFilters", "").contains("cell") &&
        s.metadata.getOrElse("PartitionFilters", "").contains("batch_id")),
      s"cell/batch_id partition filters not applied:\n" +
        scans.map(_.metadata).mkString)
  }

  test("weighted median pays exactly two windows, both off the raw stream") {
    // phase 1 windows the bucket histogram (bucket-count-sized); phase
    // 2 windows only the crossing bucket's rows — never the full table
    val df = run("q_weighted_median")
    df.collect()
    val windows = collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size == 2,
      s"expected the two bounded windows:\n${physical(df)}")
  }

  test("q_cms_audit reads lineitem exactly twice: one sketch-build scan, one probe scan (VERDICT r10 #4)") {
    // The r10 plan built the d=4 sketch as a 4-branch union — four full
    // fact-table scans where one explode(array(0..3)) suffices. Gate the
    // fix: the whole plan may scan lineitem at most twice (the one-scan
    // build + the independent top-10 exact probe side).
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = run("q_cms_audit")
    val liScans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("lineitem")) => s
    }
    assert(liScans.size <= 2,
      s"q_cms_audit scans lineitem ${liScans.size}× — the ×d union crept back:\n${physical(df)}")
  }

  test("Lloyd centroid-update fold: ONE label exchange serves both " +
      "aggregations (r17) — and values match the unpartitioned control") {
    // trainFineLevel's per-iteration update chain: (v, label) rows →
    // labelCentroids' (label, pos) fixed-point mean → per-label array
    // reassembly. Repartitioning by label ONCE below both folds must
    // satisfy the (label, pos) clustering (subset key) AND the
    // reassembly's, so the whole chain plans a single shuffle — the
    // shape that keeps every agg map bounded at nFine/parts keys at
    // any corpus (no input-sized partial-row exchange, no
    // corpus-grown object map). Guards the r17 exchange-reuse fix.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.functions.{array_sort, col, collect_list,
      expr, struct}
    import spark.implicits._
    val emb = (0 until 512).map { i =>
      (i.toLong % 37, Seq.tabulate(8)(d => (i * 31 + d * 7 % 97) / 96.0))
    }.toDF("label", "v")
    def fold(in: DataFrame): DataFrame =
      graft.operators.Similarity.labelCentroids(in, "label", "v")
        .select(col("label"), col("pos"), col("centroid"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("centroid"))))
          .as("_pc"))
        .select(col("label"),
          expr("transform(_pc, x -> x.centroid)").as("cv"))
    val optimized = fold(emb.repartition(col("label")))
    optimized.count() // materialize so AQE finalizes the plan
    val shuffles = collectWithSubqueries(
      optimized.queryExecution.executedPlan) {
      case e: ShuffleExchangeLike => e
    }
    assert(shuffles.size == 1,
      s"expected ONE exchange under the fold chain, got " +
        s"${shuffles.size}:\n${optimized.queryExecution.executedPlan}")
    // result identity vs the unpartitioned plan (two exchanges)
    val control = fold(emb).orderBy("label").collect() // bounded: 37 labels
    val got = optimized.orderBy("label").collect() // bounded: 37 labels
    assert(got.toSeq == control.toSeq,
      "label-clustered fold changed the centroid values")
  }

  test("every main-source .collect() call site carries a bound guard (VERDICT r10 #9)") {
    // The r10 audit found all 16 driver-side collects individually
    // bounded (nCells centroids, maxPlayers, vocab-bounded merges,
    // thresholded CC local-finish, maxCatalogRows, …) — each by hand.
    // This promotes that inventory to a GATE: a .collect() in main
    // source must show its bound AT the call site — a `limit(`, a
    // `require(`, or the catalog's `boundedCollect` on the collect
    // expression's own statement (same line, or an unbroken `.`-chain
    // of lines leading down to the collect), or an explicit anchored
    // `bounded:` marker comment ON the collect line naming the bound.
    // ANCHORED (ADVICE r11): the old ±3-line `bounded` substring
    // passed on 'unbounded' and on any incidental require( in the
    // window; `\bbounded:` can't match inside 'unbounded', and the
    // chain walk ties limit(/require( to the collect's own statement.
    // A marker is a CLAIM the reviewer audits, not a proof; the
    // gate's job is making the next unbounded collect impossible
    // to land silently, not proving the bound. Bench/Verify mains are
    // in scope too (they collect nothing today; if they start, they
    // justify it like everyone else).
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    assert(java.nio.file.Files.isDirectory(root),
      s"gate must run from the repo root; cwd=${System.getProperty("user.dir")}")
    val stmtGuard = java.util.regex.Pattern
      .compile("limit\\(|require\\(|boundedCollect")
    val marker = java.util.regex.Pattern.compile("\\bbounded:")
    val walk = java.nio.file.Files.walk(root)
    val offenders =
      try walk.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .flatMap { f =>
          val lines = java.nio.file.Files.readAllLines(f).asScala.toVector
          def guarded(i: Int): Boolean = {
            val line = lines(i)
            if (marker.matcher(line).find()) return true
            if (stmtGuard.matcher(line).find()) return true
            // walk UP the method chain: each line from the collect
            // upward must itself be a chain continuation (trims to a
            // leading '.') for the previous line to count as the same
            // statement; stop at the first non-chain hop
            var j = i
            while (j > 0 && lines(j).trim.startsWith(".")) {
              j -= 1
              if (stmtGuard.matcher(lines(j)).find()) return true
            }
            false
          }
          lines.zipWithIndex.collect {
            case (line, i) if line.contains(".collect()") && !guarded(i) =>
              s"$f:${i + 1}"
          }
        }.toSeq
      finally walk.close()
    assert(offenders.isEmpty,
      "unguarded .collect() sites (add a limit/require/boundedCollect " +
        s"or a '// bounded: …' justification): ${offenders.mkString(", ")}")
  }
}
