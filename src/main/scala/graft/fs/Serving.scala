package graft.fs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType}

/** Point-in-time serving — R8/R9/R10 of the reference
  * (feature_store.py:372-508) as single distributed plans.
  *
  * The reference's PIT join is an O(entities × groups) loop of
  * single-row SQLite queries (feature_store.py:431-434, the N+1
  * pattern); here each group costs exactly one hash-partition shuffle
  * on the entity key (window) plus one join — and the join is
  * broadcastable whenever the entity list is dimension-sized.
  */
object Serving {

  /** R8 `get_features` (feature_store.py:372-409): latest snapshot per
    * entity at-or-before `asOf`. The reference's `ORDER BY ts DESC
    * LIMIT 1` leaves ties to SQLite; we make them deterministic with
    * caller-supplied tie-break columns (SURVEY.md §7.3).
    *
    * Implemented as `max_by(row, (ts, tieBreak...))` — a declarative
    * aggregate, so the top-1 per entity is computed MAP-SIDE before the
    * exchange: the shuffle carries at most one row per entity per input
    * partition, instead of every record of every entity's history. (The
    * previous `row_number()=1` window form — even with Catalyst's
    * WindowGroupLimit — shuffles the full history; against a 100 TB
    * event log that difference is the serving path's bottleneck.)
    * Ties beyond (ts, tieBreak) are nondeterministic in both forms —
    * callers pass tie-breaks to pin them.
    */
  def latestAsOf(
      records: DataFrame,
      entityKey: String,
      ts: String = "ts",
      asOf: Option[Column] = None,
      tieBreak: Seq[Column] = Seq.empty): DataFrame =
    latestAsOf(records, Seq(entityKey), ts, asOf, tieBreak)

  /** Composite-key form of [[latestAsOf]]: real stores key entities on
    * (tenant, entity)-style tuples, and a multi-column groupBy costs
    * exactly the same one exchange (Spark hashes the tuple). */
  def latestAsOf(
      records: DataFrame,
      entityKeys: Seq[String],
      ts: String,
      asOf: Option[Column],
      tieBreak: Seq[Column]): DataFrame = {
    require(entityKeys.nonEmpty, "latestAsOf: need at least one key column")
    val inWindow = asOf.fold(records)(a => records.filter(col(ts) <= a))
    val ordKey = struct(col(ts) +: tieBreak: _*)
    val payload = struct(records.columns.map(col): _*)
    // key columns project from the GROUPING attributes, not the struct
    // fields (equal by construction — the payload's keys are the keys
    // the row grouped under, nulls included): a `__row.*` re-derivation
    // would sever the aggregate's output partitioning, and every
    // downstream equi-join on the entity key — pointInTimeJoin,
    // snapshotDiff — would pay a needless re-exchange of the served
    // frame (PlanSpec asserts the diff join adds none).
    val outCols = records.columns.map { c =>
      if (entityKeys.contains(c)) col(c) else col(s"__row.$c").as(c)
    }
    inWindow
      .groupBy(entityKeys.map(col): _*)
      .agg(max_by(payload, ordKey).as("__row"))
      .select(outCols.toSeq: _*)
  }

  /** R9 `point_in_time_join` (feature_store.py:411-448): for an entity
    * frame and N feature groups, attach each group's latest-as-of
    * snapshot. Later groups overwrite colliding feature names
    * (row.update, feature_store.py:436) — reproduced by dropping the
    * earlier column before attaching the later one. Entities with no
    * snapshot get nulls (the reference's None-fill, :440-442). Input
    * entity order is preserved by callers via their own ORDER BY.
    *
    * `groups` = (records, declared feature columns) per group; all keyed
    * by `entityKey`.
    */
  def pointInTimeJoin(
      entities: DataFrame,
      groups: Seq[(DataFrame, Seq[String])],
      entityKey: String,
      ts: String = "ts",
      asOf: Column,
      tieBreak: Seq[Column] = Seq.empty): DataFrame =
    groups.foldLeft(entities) { case (acc, (records, featureCols)) =>
      val latest = latestAsOf(records, entityKey, ts, Some(asOf), tieBreak)
        .select(col(entityKey) +: lit(true).as("__hit") +:
          featureCols.map(col): _*)
      val collisions = featureCols.filter(acc.columns.contains)
      // Later group wins on collision whenever the entity HAS a record
      // in it — `row.update` overwrites unconditionally, including with
      // an explicit null (feature_store.py:436). Only entities with NO
      // record keep the earlier value (`setdefault` None-fill,
      // :440-442) — hence the indicator, not a value-coalesce (VERDICT
      // r2 #3: coalesce diverged on present-but-null).
      val renamed = collisions.foldLeft(acc)(
        (a, c) => a.withColumnRenamed(c, s"${c}__prev"))
      val joined = renamed.join(latest, Seq(entityKey), "left")
      collisions.foldLeft(joined)((a, c) =>
        a.withColumn(c, when(col("__hit"), col(c)).otherwise(col(s"${c}__prev")))
          .drop(s"${c}__prev"))
        .drop("__hit")
    }

  /** Generalized as-of join (SURVEY.md §7.3 "per-row as-of"): every left
    * row carries its own event time; attach the latest right payload
    * with `rightTime <= leftTime` per key. This is the union-tag
    * technique — one shuffle on the key, a single ordered window, no
    * range-explosion and no per-row loop; it scales linearly and keeps
    * AQE/whole-stage-codegen in play, unlike a theta-join
    * (`r.ts <= l.ts`) which Spark would plan as a broadcast
    * nested-loop.
    *
    * Right payload columns are struct-packed; ties at equal time let the
    * right row win (inclusive as-of, matching the reference's
    * `timestamp <= ?` at feature_store.py:395).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      rightTieBreak: Seq[String] = Seq.empty): DataFrame =
    asOfJoin(left, right, Seq(key), leftTime, rightTime, payloadCols,
      rightTieBreak)

  /** Composite-key form of [[asOfJoin]] — same union-tag plan, the
    * window just partitions on the key tuple (one exchange either
    * way). */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      rightTieBreak: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "asOfJoin: need at least one key column")
    val keyCols = keys.map(col)
    val leftCols = left.columns.toSeq
    val restCols = leftCols.filterNot(keys.contains)
    val packCols = (payloadCols ++ rightTieBreak).distinct
    val rSide = right.select(
      (keyCols :+ col(rightTime).as("__t") :+ lit(0).as("__isLeft") :+
        struct(packCols.map(col): _*).as("__payload")): _*)
    val payloadType = rSide.schema("__payload").dataType
    val lSide = left.select(
      (keyCols ++ Seq(col(leftTime).as("__t"), lit(1).as("__isLeft"),
        lit(null).cast(payloadType).as("__payload")) ++ restCols.map(col)): _*)
    val unioned = lSide.unionByName(rSide.select(
      (keyCols ++ Seq(col("__t"), col("__isLeft"), col("__payload")) ++
        restCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*))
    // right rows (__isLeft=0) sort before left rows at equal time →
    // inclusive as-of; rightTieBreak makes the winner among equal-time
    // right rows deterministic (last() picks the max tie value).
    val order = Seq(col("__t").asc, col("__isLeft").asc) ++
      rightTieBreak.map(c => col(s"__payload.$c").asc)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__latest", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__isLeft") === 1)
      .select((leftCols.map(col) ++
        payloadCols.map(c => col(s"__latest.$c").as(c))): _*)
  }

  /** [[asOfJoin]] with a STALENESS bound — the feature-TTL serving
    * rule: a feature older than `maxAgeSec` at the label's event time
    * is no feature at all (a 90-day-old account balance must not leak
    * into today's training row as if fresh). Because the as-of match
    * is the LATEST right row at-or-before the left time, "restrict the
    * search to the tolerance window" and "null out a too-stale match"
    * coincide — any older candidate is staler still — so this runs as
    * the plain one-exchange union-tag join plus a map-side age check:
    * payload columns null out when the matched row's event time is
    * more than `maxAgeSec` seconds before the left row's. */
  def asOfJoinWithin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      maxAgeSec: Long,
      rightTieBreak: Seq[String] = Seq.empty): DataFrame = {
    require(maxAgeSec >= 0, s"asOfJoinWithin: maxAgeSec=$maxAgeSec")
    require(!left.columns.contains(rightTime) && rightTime != leftTime,
      s"asOfJoinWithin: right time column '$rightTime' collides with the left frame")
    require(!payloadCols.contains(rightTime),
      s"asOfJoinWithin: '$rightTime' rides internally for the age check; " +
        "project it on the right side under another name to keep it")
    val joined = asOfJoin(left, right, keys, leftTime, rightTime,
      (payloadCols :+ rightTime).distinct, rightTieBreak)
    // NTZ-tolerant epoch seconds: TIMESTAMP_NTZ refuses a direct long
    // cast, but casts losslessly through TimestampType under the
    // pinned UTC session TZ (the Tables.events convention); a plain
    // TimestampType passes through unchanged
    def epoch(c: Column) =
      c.cast(org.apache.spark.sql.types.TimestampType).cast(LongType)
    val fresh =
      epoch(col(leftTime)) - epoch(col(s"__matched_$rightTime")) <= maxAgeSec
    val aged = joined
      .withColumnRenamed(rightTime, s"__matched_$rightTime")
    payloadCols.foldLeft(aged) { (df, c) =>
        df.withColumn(c, when(fresh, col(c)).otherwise(lit(null)))
      }
      .drop(s"__matched_$rightTime")
  }

  /** Incremental latest-snapshot maintenance — the daily-refresh
    * serving shape: yesterday's materialized latest table (one row per
    * entity) + today's record shard → today's latest table. The
    * refresh touches |latest| + |shard| rows, never the full history —
    * on a 100 TB log that is the difference between a daily job and an
    * impossibility. Algebraically sound because `max_by` is
    * associative over row sets: latest(history) =
    * latest(latest(prefix) ∪ suffix). Same tie contract as
    * [[latestAsOf]].
    *
    * `prevLatest` must carry the same columns as the records (it is
    * itself a [[latestAsOf]] output). */
  def refreshLatest(
      prevLatest: DataFrame,
      newRecords: DataFrame,
      entityKey: String,
      ts: String = "ts",
      tieBreak: Seq[Column] = Seq.empty): DataFrame =
    latestAsOf(prevLatest.unionByName(newRecords), Seq(entityKey), ts, None,
      tieBreak)

  /** Composite-key form of [[refreshLatest]]. */
  def refreshLatest(
      prevLatest: DataFrame,
      newRecords: DataFrame,
      entityKeys: Seq[String],
      ts: String,
      tieBreak: Seq[Column]): DataFrame =
    latestAsOf(prevLatest.unionByName(newRecords), entityKeys, ts, None,
      tieBreak)

  /** One feature group for [[asOfJoinMulti]]: records keyed like the
    * left frame, its event-time column, the payload columns to attach,
    * and tie-break columns that order equal-time records (max wins). */
  final case class AsOfGroup(
      records: DataFrame, timeCol: String,
      payloadCols: Seq[String], tieBreak: Seq[String])

  /** Multi-group per-row as-of join — the training-set-generation
    * shape at its real fan-in: each left row carries its own event
    * time, and G feature groups attach their latest at-or-before
    * payload. Chaining [[asOfJoin]] G times re-shuffles the (growing)
    * left frame per group — G·|left| rows through exchanges. This
    * operator instead:
    *
    *  1. dedupes each group at (key, time) MAP-SIDE via `max_by`
    *     (partial aggregation — the shuffle carries ≤1 row per
    *     (key, time) per input partition), which both pins tie
    *     determinism and shrinks the union;
    *  2. unions left + all groups once, each group in its own payload
    *     slot;
    *  3. computes every group's fill with `last(ignoreNulls)` over the
    *     SAME window spec — Catalyst plans ONE exchange and ONE sort
    *     for all G fills.
    *
    * Cost: |left| + Σ|group_i| through one exchange, vs
    * G·|left| + Σ|group_i| for the chain — at 100 feature groups the
    * chain is two orders of magnitude more shuffle I/O on the labels.
    * Ties at equal time let the right row win (inclusive as-of), same
    * contract as [[asOfJoin]]; the per-group dedup makes the winner at
    * equal (key, time) the max-tieBreak record, matching
    * [[asOfJoin]]'s rightTieBreak rule. */
  def asOfJoinMulti(
      left: DataFrame,
      groups: Seq[AsOfGroup],
      key: String,
      leftTime: String): DataFrame =
    asOfJoinMulti(left, groups, Seq(key), leftTime)

  /** Composite-key form of [[asOfJoinMulti]] — same one-window plan
    * over the key tuple. */
  def asOfJoinMulti(
      left: DataFrame,
      groups: Seq[AsOfGroup],
      keys: Seq[String],
      leftTime: String): DataFrame = {
    require(groups.nonEmpty, "asOfJoinMulti: need at least one group")
    require(keys.nonEmpty, "asOfJoinMulti: need at least one key column")
    val keyCols = keys.map(col)
    val leftCols = left.columns.toSeq
    val restCols = leftCols.filterNot(keys.contains)
    // deduped, struct-packed right sides: one row per (keys, time)
    val packed = groups.zipWithIndex.map { case (g, i) =>
      val payload = struct(g.payloadCols.map(col): _*)
      val ord = struct((col(g.timeCol) +: g.tieBreak.map(col)): _*)
      g.records
        .groupBy((keyCols :+ col(g.timeCol).as("__t")): _*)
        .agg(max_by(payload, ord).as(s"__p$i"))
    }
    val payloadTypes = packed.zipWithIndex.map { case (p, i) =>
      i -> p.schema(s"__p$i").dataType
    }.toMap
    def slots(have: Int => Boolean): Seq[Column] =
      groups.indices.map(i =>
        (if (have(i)) col(s"__p$i")
         else lit(null).cast(payloadTypes(i))).as(s"__p$i"))
    val lSide = left.select(
      (keyCols ++ Seq(col(leftTime).as("__t"), lit(1).as("__isLeft")) ++
        slots(_ => false) ++ restCols.map(col)): _*)
    val unioned = packed.zipWithIndex.foldLeft(lSide) { case (acc, (p, i)) =>
      acc.unionByName(p.select(
        (keyCols ++ Seq(col("__t"), lit(0).as("__isLeft")) ++
          slots(_ == i) ++
          restCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*))
    }
    // right rows sort before left at equal time → inclusive as-of; all
    // G fills ride ONE window (same spec → one exchange + one sort)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("__isLeft").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = groups.indices.foldLeft(unioned) { (acc, i) =>
      acc.withColumn(s"__latest$i", last(col(s"__p$i"), ignoreNulls = true).over(w))
    }
    filled
      .filter(col("__isLeft") === 1)
      .select((leftCols.map(col) ++
        groups.zipWithIndex.flatMap { case (g, i) =>
          g.payloadCols.map(c => col(s"__latest$i.$c").as(c))
        }): _*)
  }

  /** Snapshot drift between two as-of times — the audit/debugging shape
    * of a PIT store ("what changed for whom between yesterday's serve
    * and today's?"): serve the latest snapshot at `asOf1` and `asOf2`
    * and full-outer-join them on the entity key. Each entity reports a
    * status: `added` (no snapshot at asOf1), `removed` (snapshot gone
    * at asOf2), `unchanged` (the `identityCols` agree) or `changed`.
    *
    * The two serves read separate record frames so the diff also
    * audits LOG mutations, not just time: pass the pre- and
    * post-[[graft.fs.RecordLog.forget]] (or expire) reads with the
    * same as-of to see exactly which entities a deletion batch
    * removed. Same-frame twice = the pure time diff (where `removed`
    * cannot occur on an append-only log).
    *
    * `identityCols` defines snapshot identity for the compare — pass a
    * unique record id to sidestep null-equality divergence on value
    * columns. Returns (entityKey, status, __old, __new) with the full
    * payloads struct-packed; callers project what they need.
    *
    * Scale shape: the two serves aggregate on the SAME entity key, so
    * both sides arrive at the join already hash-partitioned on it —
    * Catalyst plans the full-outer join with no additional exchange
    * (two serve shuffles total, or ZERO over a bucketed log, cf.
    * PlanSpec's bucketed-serve asserts). */
  def snapshotDiff(
      oldRecords: DataFrame,
      newRecords: DataFrame,
      entityKey: String,
      ts: String,
      asOf1: Column,
      asOf2: Column,
      tieBreak: Seq[Column],
      identityCols: Seq[String]): DataFrame = {
    require(identityCols.nonEmpty, "snapshotDiff: need identity columns")
    val payloadCols = oldRecords.columns.filterNot(_ == entityKey).map(col)
    // null-safe key equality WITHOUT a plan penalty: write() allows
    // null entity keys and latestAsOf serves them as one group per
    // side, but a plain equi-join on the raw key would report that
    // entity as spuriously removed AND added (a false deletion signal
    // in the deletion-audit tool, review r9), while a `<=>` join
    // rewrites its keys to [coalesce(k, 0), isnull(k)] and re-exchanges
    // BOTH serves. Wrapping the key in a one-field struct gives both
    // properties at once: the struct is a non-null container (equality
    // compares fields under null-safe ordering semantics) and it is
    // the serve's own grouping attribute, so the join reuses the serve
    // partitioning (PlanSpec asserts).
    def served(records: DataFrame, asOf: Column, side: String) =
      latestAsOf(records.withColumn("__k", struct(col(entityKey))),
          Seq("__k"), ts, Some(asOf), tieBreak)
        .select(col("__k").as(s"__k_$side"),
          struct(payloadCols: _*).as(s"__$side"))
    val same = identityCols
      .map(c => col(s"__old.$c") === col(s"__new.$c"))
      .reduce(_ && _)
    served(oldRecords, asOf1, "old")
      .join(served(newRecords, asOf2, "new"),
        col("__k_old") === col("__k_new"), "full_outer")
      .withColumn(entityKey,
        coalesce(col("__k_old"), col("__k_new")).getField(entityKey))
      .drop("__k_old", "__k_new")
      .withColumn("status",
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(same, lit("unchanged"))
          .otherwise(lit("changed")))
  }

  /** R10 `statistics` (feature_store.py:450-508): one aggregation pass
    * over a group's records producing per-feature `count` (non-null),
    * `null_count`, and — for numeric dtypes, where Python `bool` counts
    * as numeric (feature_store.py:484) — `mean` (rounded to 6 dp,
    * :486,490), `min`, `max`. Non-numeric features report null
    * mean/min/max. Output is long-form (feature, count, null_count,
    * mean, min, max), one row per declared feature, via a single
    * `groupBy().agg(...)` + stack — no per-feature scan.
    */
  def statistics(records: DataFrame, features: Seq[(String, String)]): DataFrame = {
    // Empty feature list: no rows (one output row per feature), not a
    // malformed stack(0,) expression (VERDICT r2 #4).
    if (features.isEmpty) {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("feature", StringType), StructField("count", LongType),
        StructField("null_count", LongType), StructField("mean", DoubleType),
        StructField("min", DoubleType), StructField("max", DoubleType),
        StructField("total_records", LongType)))
      return records.sparkSession.createDataFrame(
        records.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val aggs: Seq[Column] = features.flatMap { case (name, dtype) =>
      val c = col(name)
      val numeric = dtype match {
        case "int" | "float" => Some(c.cast(DoubleType))
        case "bool"          => Some(c.cast(BooleanType).cast(DoubleType))
        case _               => None
      }
      Seq(
        count(c).as(s"${name}__count"),
        // coalesce: a zero-row frame sums to null; the reference
        // reports 0 (feature_store.py null_count on empty groups)
        coalesce(sum(c.isNull.cast(LongType)), lit(0L)).as(s"${name}__nulls")) ++
        (numeric match {
          case Some(n) => Seq(
            // decimal-exact sum → identical IEEE division on any
            // partial-agg order (matches Tables.dmean's convention)
            round((sum(n.cast(org.apache.spark.sql.types.DecimalType(24, 6)))
              .cast(DoubleType) / count(n)), 6).as(s"${name}__mean"),
            min(n).as(s"${name}__min"),
            max(n).as(s"${name}__max"))
          case None => Seq(
            lit(null).cast(DoubleType).as(s"${name}__mean"),
            lit(null).cast(DoubleType).as(s"${name}__min"),
            lit(null).cast(DoubleType).as(s"${name}__max"))
        })
    } :+ count(lit(1)).as("total_records")
    val wide = records.agg(aggs.head, aggs.tail: _*)
    val stackExpr = features.map { case (name, _) =>
      s"'$name', ${name}__count, ${name}__nulls, ${name}__mean, ${name}__min, ${name}__max"
    }.mkString(", ")
    wide.selectExpr(
      "total_records",
      s"stack(${features.size}, $stackExpr) as (feature, count, null_count, mean, min, max)")
      .select("feature", "count", "null_count", "mean", "min", "max", "total_records")
  }
}
