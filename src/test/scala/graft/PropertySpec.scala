package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.fs.Serving
import graft.plans.BoundedTopK

/** Randomized differential tests: each distributed operator vs a naive
  * in-memory reference on seeded random data (seeded → reproducible;
  * no generator-library dependency). These catch the semantics that
  * example-based tests miss — tie handling, null interactions, empty
  * groups. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(0xC0FFEE)

  test("BoundedTopK ≡ sort-based top-k on random scores (ties, dups, NaN-free)") {
    for (trial <- 1 to 3) {
      val k = 1 + rnd.nextInt(6)
      val rows = Seq.fill(400) {
        (rnd.nextInt(5).toLong,                      // group
          (rnd.nextInt(20) / 4.0),                   // score with many ties
          rnd.nextInt(100).toLong)                   // id (dups possible)
      }
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3)).distinct      // dedup not needed; keep all
      }
      // reference: sort score desc then id asc, take k
      val ref = rows.groupBy(_._1).view.mapValues { rs =>
        rs.map(r => (r._2, r._3)).sortBy { case (s, i) => (-s, i) }.take(k)
      }.toMap
      val got = rows.toDF("g", "score", "id")
        .groupBy($"g")
        .agg(BoundedTopK.column($"score", $"id", k).as("top"))
        .select($"g", $"top")
        .as[(Long, Seq[(Double, Long)])].collect().toMap
      assert(got.keySet == ref.keySet, s"trial $trial groups")
      for ((g, exp) <- ref)
        assert(got(g) == exp, s"trial $trial k=$k group $g: ${got(g)} vs $exp")
      assert(expected.nonEmpty) // keep the intermediate used
    }
  }

  test("StableIds.assign + ntileFromRank ≡ global ntile window on random frames") {
    import graft.operators.StableIds
    for (trial <- 1 to 3) {
      val tiles = 2 + rnd.nextInt(6)
      val n = 20 + rnd.nextInt(180)
      // coarse integer value (many ties) + unique id tie-break — the
      // exact shape q_rfm rides; bucket = the value itself
      val rows = Seq.tabulate(n)(i => (rnd.nextInt(12).toLong, i.toLong))
      val df = rows.toDF("v", "id")
      val viaWindow = df.withColumn("t",
          ntile(tiles).over(org.apache.spark.sql.expressions.Window
            .orderBy($"v", $"id")))
        .select($"id", $"t".cast("long")).as[(Long, Long)].collect().toMap
      val ranked = StableIds.assign(df, $"v", Seq($"id"), "rk")
      val viaRank = ranked.crossJoin(
          broadcast(df.groupBy().agg(count(lit(1)).as("nn"))))
        .select($"id",
          StableIds.ntileFromRank($"rk", $"nn", tiles).as("t"))
        .as[(Long, Long)].collect().toMap
      assert(viaRank == viaWindow,
        s"trial $trial tiles=$tiles n=$n: two-phase ntile diverged")
    }
  }

  test("null-safe desc bucket ≡ ntile(ORDER BY v DESC NULLS LAST) — the q_rfm monetary shape (ADVICE r10)") {
    import graft.operators.StableIds
    // A user whose events all carry NULL value has NULL monetary; the
    // oracle's ntile(ORDER BY monetary DESC) places NULLs LAST, so the
    // bucket must coalesce NULL to Long.MaxValue (worst tile), not let
    // the NULL bucket sort first and hand such users the best tile.
    for (trial <- 1 to 3) {
      val tiles = 2 + rnd.nextInt(6)
      val n = 20 + rnd.nextInt(180)
      val rows = Seq.tabulate(n) { i =>
        (if (rnd.nextInt(8) == 0) None
         else Some(rnd.nextInt(12).toDouble + rnd.nextDouble()), i.toLong)
      }
      val df = rows.toDF("v", "id")
      val viaWindow = df.withColumn("t",
          ntile(tiles).over(org.apache.spark.sql.expressions.Window
            .orderBy($"v".desc_nulls_last, $"id")))
        .select($"id", $"t".cast("long")).as[(Long, Long)].collect().toMap
      val ranked = StableIds.assign(df,
        coalesce(floor(negate($"v")).cast("long"), lit(Long.MaxValue)),
        Seq($"v".desc_nulls_last, $"id"), "rk")
      val viaRank = ranked.crossJoin(
          broadcast(df.groupBy().agg(count(lit(1)).as("nn"))))
        .select($"id",
          StableIds.ntileFromRank($"rk", $"nn", tiles).as("t"))
        .as[(Long, Long)].collect().toMap
      assert(viaRank == viaWindow,
        s"trial $trial tiles=$tiles n=$n: null-monetary tile diverged")
    }
  }

  test("assignPartitioned ≡ per-partition row_number window on random frames") {
    import graft.operators.StableIds
    for (trial <- 1 to 3) {
      val n = 100 + rnd.nextInt(200)
      // includes a NULL partition key — the null-safe join must keep it
      val rows = Seq.tabulate(n)(i =>
        (if (rnd.nextInt(10) == 0) None else Some(s"s${rnd.nextInt(4)}"),
          rnd.nextInt(9).toLong, i.toLong))
      val df = rows.toDF("src", "v", "id")
      val viaWindow = df.withColumn("rk",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy($"src").orderBy($"v", $"id")))
        .withColumn("np", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy($"src")))
        .select($"id", $"rk".cast("long"), $"np")
        .as[(Long, Long, Long)].collect().map { case (i, r, c) => i -> ((r, c)) }.toMap
      val got = StableIds.assignPartitioned(df, Seq("src"), $"v",
          Seq($"id"), "rk", Some("np"))
        .select($"id", $"rk", $"np")
        .as[(Long, Long, Long)].collect().map { case (i, r, c) => i -> ((r, c)) }.toMap
      assert(got == viaWindow, s"trial $trial n=$n diverged")
    }
  }

  test("prefixSumPartitioned ≡ per-partition running-sum window on random frames") {
    import graft.operators.StableIds
    for (trial <- 1 to 3) {
      val n = 100 + rnd.nextInt(200)
      val rows = Seq.tabulate(n)(i =>
        (s"s${rnd.nextInt(3)}", rnd.nextInt(50).toLong, i.toLong,
          (rnd.nextInt(11) - 5).toLong))
      val df = rows.toDF("src", "v", "id", "x")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"src").orderBy($"v", $"id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val viaWindow = df
        .withColumn("cum", sum($"x").over(w))
        .withColumn("tot", sum($"x").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"src")))
        .select($"id", $"cum", $"tot")
        .as[(Long, Long, Long)].collect().map { case (i, c, t) => i -> ((c, t)) }.toMap
      // bucket = v/10: coarse-monotone with ~5 rows per bucket, so the
      // multi-bucket offset path is genuinely exercised
      val got = StableIds.prefixSumPartitioned(df, Seq("src"),
          ($"v" / 10).cast("long"), Seq($"v", $"id"), $"x", "cum",
          Some("tot"))
        .select($"id", $"cum", $"tot")
        .as[(Long, Long, Long)].collect().map { case (i, c, t) => i -> ((c, t)) }.toMap
      assert(got == viaWindow, s"trial $trial n=$n diverged")
    }
  }

  test("aucRankSum ≡ brute-force pair counting on random scores") {
    import graft.operators.Eval
    for (trial <- 1 to 3) {
      val rows = Seq.fill(120)(
        (rnd.nextInt(15) / 14.0, rnd.nextBoolean()))
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      // AUC = P(pos > neg) + ½P(tie), enumerated over all pairs
      val wins = (for (p <- pos; q <- neg)
        yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
      val ref = BigDecimal(wins / (pos.size.toLong * neg.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val got = Eval.aucRankSum(rows.toDF("s", "y"), $"s", $"y")
        .select($"auc").as[Double].head()
      assert(got == ref, s"trial $trial: rank-sum $got vs pairs $ref")
    }
  }

  test("asOfJoin ≡ naive per-row latest-at-or-before on random events") {
    for (trial <- 1 to 2) {
      val leftRows = Seq.tabulate(150)(i =>
        (rnd.nextInt(8).toLong, 1000L + rnd.nextInt(500), i.toLong))
      val rightRows = Seq.tabulate(120)(i =>
        (rnd.nextInt(8).toLong, 1000L + rnd.nextInt(500), i.toLong,
          rnd.nextInt(1000).toDouble))
      val left = leftRows.toDF("k", "lt", "lid")
        .withColumn("lt", timestamp_seconds($"lt"))
      val right = rightRows.toDF("k", "rt", "rid", "payload")
        .withColumn("rt", timestamp_seconds($"rt"))
      val got = Serving.asOfJoin(left, right, "k", "lt", "rt",
          payloadCols = Seq("rid", "payload"), rightTieBreak = Seq("rid"))
        .select($"lid", $"rid", $"payload")
        .as[(Long, Option[Long], Option[Double])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      // naive: per left row, right rows same key with rt<=lt; winner =
      // max (rt, rid) — inclusive as-of with rid tie-break
      val ref = leftRows.map { case (k, lt, lid) =>
        val cands = rightRows.filter(r => r._1 == k && r._2 <= lt)
        val win = if (cands.isEmpty) (None, None)
          else {
            val w = cands.maxBy(r => (r._2, r._3))
            (Some(w._3), Some(w._4))
          }
        lid -> win
      }.toMap
      assert(got.size == ref.size, s"trial $trial row count")
      for ((lid, exp) <- ref)
        assert(got(lid) == exp, s"trial $trial left row $lid")
    }
  }

  test("refreshTopK ≡ full recompute over any shard fold") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 4)
    val shards = Seq(
      emb.filter($"vec_id" % 3 === 0),
      emb.filter($"vec_id" % 3 === 1),
      emb.filter($"vec_id" % 3 === 2))
    val folded = shards.tail.foldLeft(
      Similarity.bruteForceTopK(queries, shards.head, "vec_id", "embedding", 5)) {
      (acc, shard) =>
        Similarity.refreshTopK(acc, queries, shard, "vec_id", "embedding", 5)
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    val full = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
    assert(rows(folded) == rows(full), "3-shard incremental fold drifted")
    // at-least-once redelivery: folding a shard AGAIN must be a no-op
    // (duplicate pairs deduped before the heap)
    val replayed = Similarity.refreshTopK(folded, queries, shards(1),
      "vec_id", "embedding", 5)
    assert(rows(replayed) == rows(full), "redelivered shard corrupted top-k")
  }

  test("knn graph index: replay-idempotent append, new nodes ranked, " +
      "clone surfaces as nearest, build == in-memory knnGraph (r13)") {
    // the incremental == frozen-quantizer-full-recompute equivalence
    // itself is hash-gated by the q_knn_append / q_knn_index oracles;
    // this spec covers the operator contracts the oracle can't see:
    // the persisted build serves exactly what in-memory knnGraph
    // computes, batch nodes get full top-k rows, an appended
    // near-copy surfaces as its original's nearest neighbor, and
    // re-appending the same batchId is a no-op (at-least-once
    // replay through the overwrite-own-partition layout).
    import graft.operators.Similarity
    val dir = java.nio.file.Files
      .createTempDirectory("knn_graph_idx").toString
    val emb = Tables.embeddings(spark, sf)
    val build = emb.filter($"vec_id" >= 50 && $"vec_id" < 200)
    val n = build.count()
    val occ = Similarity.balancedOccupancy(n, minOccupancy = 32)
    val nCells = Similarity.cellsForOccupancy(n, occ)
    val maxCell = (64L * occ).toInt
    Similarity.buildKnnGraphIndex(build, "vec_id", "embedding", dir,
      k = 5, nCells = nCells, trainIters = 2, trainFraction = 0.25,
      maxCell = maxCell)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    // the persisted base must serve the in-memory graph verbatim
    assert(rows(Similarity.knnGraphFromIndex(spark, dir)) ==
      rows(Similarity.knnGraph(build, "vec_id", "embedding", k = 5,
        nCells = nCells, trainIters = 2, trainFraction = 0.25,
        maxCell = maxCell)),
      "persisted build diverged from in-memory knnGraph")
    // batch = a clone of build vector 60 (same cell, sim 1.0) plus a
    // fresh real vector
    val batch = build.filter($"vec_id" === 60)
      .select(lit(9999L).as("vec_id"), $"embedding")
      .unionByName(emb.filter($"vec_id" === 3)
        .select($"vec_id".cast("long").as("vec_id"), $"embedding"))
    Similarity.appendToKnnGraphIndex(batch, "vec_id", "embedding",
      dir, batchId = 0L)
    val got = rows(Similarity.knnGraphFromIndex(spark, dir))
    // the clone lands in 60's cell at sim 1.0 → 60's new top-1
    assert(got.contains((60L, 9999L, 1)), "clone must top the original")
    assert(got.contains((9999L, 60L, 1)), "original must top the clone")
    // every batch node got a full heap (its cells hold ≥ k members)
    assert(got.count(_._1 == 3L) == 5, "new node must carry k rows")
    // untouched prev rows ride through: prev nodes stay present
    val prevIds = build.select($"vec_id".cast("long")).as[Long]
      .collect().toSet
    assert(prevIds.subsetOf(got.map(_._1)), "an existing node vanished")
    // at-least-once replay: re-appending the same batchId must leave
    // the served graph unchanged (the replay reads the index minus
    // its own partition and overwrites it)
    Similarity.appendToKnnGraphIndex(batch, "vec_id", "embedding",
      dir, batchId = 0L)
    assert(rows(Similarity.knnGraphFromIndex(spark, dir)) == got,
      "redelivered batch corrupted the graph")
    // compaction folds the deltas serve-identically and collapses the
    // per-append file growth
    import graft.operators.IndexLayout
    val filesBefore = IndexLayout.dataFileCount(spark, s"$dir/graph")
    Similarity.compactKnnGraphIndex(spark, dir)
    assert(rows(Similarity.knnGraphFromIndex(spark, dir)) == got,
      "compaction changed the served graph")
    assert(IndexLayout.dataFileCount(spark, s"$dir/graph") < filesBefore,
      "graph files did not collapse")
    // staged rebuild swaps in whole — probes then serve the new corpus
    val union = build
      .select($"vec_id".cast("long").as("vec_id"), $"embedding")
      .unionByName(batch)
    Similarity.rebuildKnnGraphIndex(union, "vec_id", "embedding", dir,
      k = 5, nCells = nCells, trainIters = 2, trainFraction = 0.25,
      maxCell = maxCell)
    val rebuilt = rows(Similarity.knnGraphFromIndex(spark, dir))
    assert(rebuilt.map(_._1).contains(9999L),
      "rebuilt index must cover the appended nodes")
    assert(!new java.io.File(s"${dir}__staged").exists(),
      "stage must be gone after the swap")
  }

  test("refreshLatest ≡ full recompute: incremental days fold to the same table") {
    // random history split into 3 "days"; folding refreshLatest over
    // the shards must equal latestAsOf over the whole history
    for (trial <- 1 to 2) {
      val rows = Seq.tabulate(300)(i =>
        (rnd.nextInt(25).toLong, 1000L + rnd.nextInt(300), i.toLong,
          rnd.nextInt(1000).toDouble))
      val df = rows.toDF("user_id", "t", "rec_id", "v")
        .withColumn("ts", timestamp_seconds($"t")).drop("t")
      val shards = Seq(
        df.filter($"rec_id" % 3 === 0),
        df.filter($"rec_id" % 3 === 1),
        df.filter($"rec_id" % 3 === 2))
      val folded = shards.tail.foldLeft(
        Serving.latestAsOf(shards.head, "user_id", "ts",
          tieBreak = Seq($"rec_id"))) { (acc, day) =>
        Serving.refreshLatest(acc, day, "user_id", "ts", Seq($"rec_id"))
      }.select($"user_id", $"rec_id").as[(Long, Long)].collect().toMap
      val full = Serving.latestAsOf(df, "user_id", "ts",
          tieBreak = Seq($"rec_id"))
        .select($"user_id", $"rec_id").as[(Long, Long)].collect().toMap
      assert(folded == full, s"trial $trial: incremental fold drifted")
    }
  }

  test("IncrementalAgg fold ≡ one-shot partial over any shard split") {
    import graft.operators.IncrementalAgg
    val rnd = new scala.util.Random(11)
    val rows = (0 until 2000).map { i =>
      (s"t${rnd.nextInt(6)}", math.round(rnd.nextDouble() * 1e6) / 1e4, i) }
      .toDF("k", "v", "i")
    val whole = IncrementalAgg.partial(rows, Seq("k"), "v")
    for (nShards <- Seq(2, 3, 7)) {
      val parts = (0 until nShards).map(s =>
        IncrementalAgg.partial(rows.filter(pmod(col("i"), lit(nShards)) === s),
          Seq("k"), "v"))
      val folded = parts.tail.foldLeft(parts.head)(
        (acc, p) => IncrementalAgg.merge(acc, p, Seq("k")))
      // exact equality — decimal sums make the fold associative; a
      // double-summed version would drift in the last ulp here
      assert(folded.select("k", "n", "s").as[(String, Long, BigDecimal)]
        .collect().toSet ==
        whole.select("k", "n", "s").as[(String, Long, BigDecimal)]
          .collect().toSet, s"drift at nShards=$nShards")
    }
  }

  test("asOfJoinMulti ≡ chained asOfJoin on random two-group events") {
    for (trial <- 1 to 2) {
      val leftRows = Seq.tabulate(120)(i =>
        (rnd.nextInt(6).toLong, 1000L + rnd.nextInt(400), i.toLong))
      def mkRight(n: Int) = Seq.tabulate(n)(i =>
        (rnd.nextInt(6).toLong, 1000L + rnd.nextInt(400), i.toLong,
          rnd.nextInt(1000).toDouble))
      val g1Rows = mkRight(90); val g2Rows = mkRight(70)
      val left = leftRows.toDF("k", "lt", "lid")
        .withColumn("lt", timestamp_seconds($"lt"))
      def rdf(rows: Seq[(Long, Long, Long, Double)], p: String) =
        rows.toDF("k", "rt", s"${p}_id", s"${p}_v")
          .withColumn("rt", timestamp_seconds($"rt"))
      val g1 = rdf(g1Rows, "a"); val g2 = rdf(g2Rows, "b")
      val multi = Serving.asOfJoinMulti(left,
          Seq(Serving.AsOfGroup(g1, "rt", Seq("a_id", "a_v"), Seq("a_id")),
            Serving.AsOfGroup(g2, "rt", Seq("b_id", "b_v"), Seq("b_id"))),
          "k", "lt")
        .select($"lid", $"a_id", $"a_v", $"b_id", $"b_v")
        .as[(Long, Option[Long], Option[Double], Option[Long], Option[Double])]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      val chained = {
        val s1 = Serving.asOfJoin(left, g1, "k", "lt", "rt",
          Seq("a_id", "a_v"), Seq("rt", "a_id"))
        Serving.asOfJoin(s1, g2, "k", "lt", "rt",
          Seq("b_id", "b_v"), Seq("rt", "b_id"))
      }.select($"lid", $"a_id", $"a_v", $"b_id", $"b_v")
        .as[(Long, Option[Long], Option[Double], Option[Long], Option[Double])]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      assert(multi.size == chained.size, s"trial $trial sizes")
      for ((lid, exp) <- chained)
        assert(multi(lid) == exp, s"trial $trial left row $lid")
    }
  }

  test("editNearDups ≡ naive all-pairs Levenshtein on random near-copies") {
    // random docs + mutated near-copies; reference = full O(n²) pairs
    // with the same blocking rule applied
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val base = Seq.tabulate(20)(i =>
      (i.toLong, Seq.fill(8)(words(rnd.nextInt(words.length))).mkString(" ")))
    val mutated = base.take(8).map { case (id, t) =>
      val chars = t.toCharArray
      chars(5 + rnd.nextInt(chars.length - 5)) = 'x' // keep the block prefix
      (id + 100, new String(chars))
    }
    val docs = (base ++ mutated).toDF("doc_id", "text")
    val got = graft.operators.Dedup.editNearDups(docs, "text", "doc_id",
        blockLen = 5, cmpLen = 40, maxDist = 6)
      .as[(Long, Long, Int)].collect().toSet
    val all = (base ++ mutated).map { case (id, t) => (id, t.toLowerCase.take(40)) }
    val ref = (for {
      (ia, ta) <- all; (ib, tb) <- all
      if ia < ib && ta.take(5) == tb.take(5)
      d = lev(ta, tb) if d <= 6
    } yield (ia, ib, d)).toSet
    assert(got == ref, s"got ${got.size} pairs, expected ${ref.size}")
    assert(ref.nonEmpty, "test must plant at least one near-dup pair")
  }

  test("pointInTimeJoin ≡ naive row.update/setdefault fold on random groups") {
    for (trial <- 1 to 2) {
      val nEntities = 30
      val asOfSec = 1250L
      def mkGroup(): Seq[(Long, Long, Long, Option[Double])] =
        Seq.tabulate(60)(i => (rnd.nextInt(nEntities + 5).toLong,
          1000L + rnd.nextInt(500), i.toLong,
          if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(100).toDouble)))
      val g1 = mkGroup(); val g2 = mkGroup()
      def df(rows: Seq[(Long, Long, Long, Option[Double])]) =
        rows.toDF("user_id", "tsec", "event_id", "v")
          .withColumn("ts", timestamp_seconds($"tsec")).drop("tsec")
      val entities = (0L until nEntities).toDF("user_id")
      val got = Serving.pointInTimeJoin(
          entities,
          Seq((df(g1), Seq("v")), (df(g2), Seq("v"))),
          "user_id", "ts", timestamp_seconds(lit(asOfSec)),
          tieBreak = Seq(col("event_id")))
        .select($"user_id", $"v").as[(Long, Option[Double])]
        .collect().toMap
      // naive reference: latest record per entity per group (ts<=asOf,
      // tie-break event_id); later group's record — even a null value —
      // overwrites; entities with no later record keep the earlier one
      def latest(rows: Seq[(Long, Long, Long, Option[Double])], u: Long) =
        rows.filter(r => r._1 == u && r._2 <= asOfSec)
          .sortBy(r => (r._2, r._3)).lastOption
      val ref = (0L until nEntities).map { u =>
        val r1 = latest(g1, u).map(_._4)
        val r2 = latest(g2, u).map(_._4)
        u -> r2.orElse(r1).flatten
      }.toMap
      assert(got.size == nEntities)
      for ((u, exp) <- ref) assert(got(u) == exp,
        s"trial $trial entity $u: got ${got(u)} expected $exp " +
          s"(g1=${latest(g1, u)}, g2=${latest(g2, u)})")
    }
  }
}
