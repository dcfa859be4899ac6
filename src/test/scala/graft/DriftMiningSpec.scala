package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Drift, Similarity}

/** Specs for the drift / span-dedup / mixture-sampling / hard-negative
  * additions (r9 continuation). */
class DriftMiningSpec extends SparkSpec {
  import spark.implicits._

  // ----- Drift.histogramDrift ------------------------------------------

  // Hand-computable case, nBins=2 (B=2): ref = [1.00, 1.00, 2.00, 2.00]
  // → sv [100,100,200,200], lo=100 hi=200 width=101, bins [2, 2];
  // cur = [2.00 ×4] → bins [0, 4]. Smoothed (c+1)/(n+2): p_ref =
  // [1/2, 1/2], p_cur = [1/6, 5/6].
  //   tvd   = ½(|1/2−1/6| + |1/2−5/6|) = 1/3
  //   worst = 1/3
  //   psi   = (1/6−1/2)·ln(1/3) + (5/6−1/2)·ln(5/3) ≈ 0.536479
  private def refDf = Seq(("a", 1.00), ("a", 1.00), ("a", 2.00), ("a", 2.00))
    .toDF("k", "v")
  private def curDf = Seq(("a", 2.00), ("a", 2.00), ("a", 2.00), ("a", 2.00))
    .toDF("k", "v")

  test("histogramDrift: exact tvd/worst_gap and psi on a hand-built case") {
    val r = Drift.histogramDrift(refDf, curDf, "k", "v", nBins = 2)
      .select("k", "n_ref", "n_cur", "lo", "hi", "tvd", "worst_gap", "psi")
      .as[(String, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(r == Seq(("a", 4L, 4L, 100L, 200L, 0.333333, 0.333333, 0.536479)))
  }

  test("histogramDrift: identical windows drift to zero") {
    val r = Drift.histogramDrift(refDf, refDf, "k", "v", nBins = 2)
      .select("tvd", "worst_gap", "psi").as[(Double, Double, Double)]
      .collect().toSeq
    assert(r == Seq((0.0, 0.0, 0.0)))
  }

  test("histogramDrift: keys missing from either window are dropped; " +
      "out-of-range current values clamp into edge bins") {
    val ref = Seq(("a", 1.0), ("a", 2.0), ("refonly", 5.0)).toDF("k", "v")
    val cur = Seq(("a", -100.0), ("a", 900.0), ("curonly", 5.0)).toDF("k", "v")
    val r = Drift.histogramDrift(ref, cur, "k", "v", nBins = 2)
    assert(r.select("k").as[String].collect().toSeq == Seq("a"))
    // both cur values clamp (one per edge bin): cur bins [1,1], ref
    // bins [1,1] → identical smoothed distributions → zero drift
    assert(r.select("tvd").as[Double].head() == 0.0)
  }

  test("histogramDrift: constant reference (lo == hi) still bins") {
    val ref = Seq(("a", 3.0), ("a", 3.0)).toDF("k", "v")
    val cur = Seq(("a", 3.0), ("a", 9.0)).toDF("k", "v")
    // width 1: everything lands in bin 0 (9.0 clamps to hi)
    val r = Drift.histogramDrift(ref, cur, "k", "v", nBins = 2)
      .select("tvd").as[Double].collect().toSeq
    assert(r == Seq(0.0))
  }

  // ----- Dedup.spanDupStats --------------------------------------------

  private def docs = Seq(
    (1L, "a b c d e"),        // spans: "a b c","b c d","c d e"
    (2L, "x y z a b c"),      // shares "a b c" with doc 1
    (3L, "p q r p q r"),      // self-repeat only → distinct spans, no flag
    (4L, "short"),            // < k tokens → whole-doc span
    (5L, "short"))            // exact short duplicate of doc 4
    .toDF("doc_id", "text")

  test("spanDupStats: cross-doc shared spans flagged, self-repeats not") {
    val r = Dedup.spanDupStats(docs, "text", "doc_id", k = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      (1L, 3L, 1L, 0.333333),
      (2L, 4L, 1L, 0.25),
      (4L, 1L, 1L, 1.0),
      (5L, 1L, 1L, 1.0)))
  }

  test("spanDupStats: disjoint corpus produces no rows") {
    val d = Seq((1L, "a b c d"), (2L, "e f g h")).toDF("doc_id", "text")
    assert(Dedup.spanDupStats(d, "text", "doc_id", k = 3).count() == 0L)
  }

  test("spanDupStats: ubiquitous boilerplate span is capped and observable (VERDICT r9 #5)") {
    // 6 docs share the planted boilerplate "tos apply here"; docs 1-2
    // additionally share a genuine dup span. With maxDocs = 3 the
    // 6-doc hash drops (observable), the 2-doc hash survives.
    val d = (1L to 6L).map { i =>
      val extra = if (i <= 2) " real dup span" else s" uniq$i a$i b$i"
      (i, s"tos apply here$extra")
    }.toDF("doc_id", "text")
    val r = Dedup.spanDupStats(d, "text", "doc_id", k = 3, maxDocs = 3,
        observeAs = Some("span_cap_t"))
      .orderBy("doc_id")
    // collect() on r itself — a derived .as[] Dataset would execute
    // its own QueryExecution and leave r's observedMetrics empty
    val rows = r.collect().toSeq
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    // only docs 1-2's "real dup span" windows survive: each doc has 4
    // spans, of which "apply here real"/"here real dup"/"real dup span"
    // are cross-doc-shared within the pair ("tos apply here" capped)
    assert(rows == Seq((1L, 4L, 3L, 0.75), (2L, 4L, 3L, 0.75)))
    val m = r.queryExecution.observedMetrics("span_cap_t")
    assert(m.getAs[Long]("dropped_rows") == 6L)
    assert(m.getAs[Long]("max_span_docs") == 6L)
  }

  // ----- Similarity.hardNegativesTopK ----------------------------------

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f), 0),
    (1L, Array(1.0f, 0.0f), 0),   // same label as query → excluded
    (2L, Array(0.9f, 0.1f), 1),
    (3L, Array(0.0f, 1.0f), 1),
    (4L, Array(1.0f, 0.1f), 2))
    .toDF("vec_id", "embedding", "label")

  test("hardNegativesTopK: nearest different-label rows, ranked") {
    val r = Similarity.hardNegativesTopK(
        vecs.filter(col("vec_id") === 0L), vecs,
        "vec_id", "embedding", "label", k = 2)
      .orderBy("rank")
      .select("query_id", "q_label", "neighbor_id", "n_label", "rank")
      .as[(Long, Int, Long, Int, Int)].collect().toSeq
    // cos(q, v4) = 1/√1.01 ≈ 0.995037 > cos(q, v2) = 0.9/√0.82 ≈ 0.993884
    assert(r == Seq((0L, 0, 4L, 2, 1), (0L, 0, 2L, 1, 2)))
  }

  test("hardNegativesTopK: never returns a same-label neighbor") {
    val r = Similarity.hardNegativesTopK(
      vecs.filter(col("vec_id") < 2), vecs, "vec_id", "embedding", "label",
      k = 10)
    assert(r.filter(col("q_label") === col("n_label")).count() == 0L)
  }

  // ----- Dedup.scrubSpans ----------------------------------------------

  test("scrubSpans: cuts cross-doc-shared windows, keeps the rest") {
    val d = Seq(
      (1L, "a b c d e"),   // shares "a b c" (pos 0) → keeps "d e"
      (2L, "x y a b c"),   // shares "a b c" (pos 2) → keeps "x y"
      (3L, "p q r p q r"), // self-repeat only → untouched
      (4L, "short"), (5L, "short")) // whole-doc dup → scrubbed empty
      .toDF("doc_id", "text")
    val r = Dedup.scrubSpans(d, "text", "doc_id", k = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(r == Seq(
      (1L, 5L, 3L, "d e"),
      (2L, 5L, 3L, "x y"),
      (3L, 6L, 0L, "p q r p q r"),
      (4L, 1L, 1L, ""),
      (5L, 1L, 1L, "")))
  }

  test("scrubSpans: overlapping duplicated windows merge their coverage") {
    // docs share the 4-token run "a b c d": doc 1's windows at 0 and 1
    // are both duplicated → positions 0..3 covered, keeps only "e"
    val d = Seq((1L, "a b c d e"), (2L, "a b c d")).toDF("doc_id", "text")
    val r = Dedup.scrubSpans(d, "text", "doc_id", k = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(r == Seq((1L, 5L, 4L, "e"), (2L, 4L, 4L, "")))
  }

  test("scrubSpans: ubiquitous boilerplate positions are capped and observable (VERDICT r9 #5)") {
    // "t o s" opens all 6 docs (6 positions) — over the cap of 4, so
    // it is NOT scrubbed; the pair-shared "a b c" (2 positions) is.
    val d = (1L to 6L).map { i =>
      val tail = if (i <= 2) "a b c" else s"u$i v$i w$i"
      (i, s"t o s $tail")
    }.toDF("doc_id", "text")
    val r = Dedup.scrubSpans(d, "text", "doc_id", k = 3, maxPositions = 4,
        observeAs = Some("scrub_cap_t"))
      .orderBy("doc_id")
    // collect() on r itself — a derived .as[] Dataset would execute
    // its own QueryExecution and leave r's observedMetrics empty
    val rows = r.collect().toSeq.take(3)
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    // docs 1-2: windows at positions 1..3 ("o s a","s a b","a b c")
    // are pair-shared → positions 1..5 covered, only "t" survives;
    // docs 3+ lose nothing (their only shared window "t o s" is capped)
    assert(rows == Seq(
      (1L, 6L, 5L, "t"), (2L, 6L, 5L, "t"), (3L, 6L, 0L, "t o s u3 v3 w3")))
    val m = r.queryExecution.observedMetrics("scrub_cap_t")
    assert(m.getAs[Long]("dropped_rows") == 6L)
    assert(m.getAs[Long]("max_bucket_n") == 6L)
  }

  // ----- Similarity.semDedupPairs --------------------------------------

  // two well-separated clusters on orthogonal axes, each with an
  // internal near-dup pair; ids chosen so seeding picks one vector
  // from each cluster region regardless of md5 order (all vectors are
  // candidates; Lloyd converges to the two axis means)
  private def clustered = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.99f, 0.01f, 0.0f)),   // near-dup of 1
    (3L, Array(0.7f, 0.05f, 0.0f)),
    (10L, Array(0.0f, 1.0f, 0.0f)),
    (11L, Array(0.0f, 0.99f, 0.01f)),  // near-dup of 10
    (12L, Array(0.05f, 0.7f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("semDedupPairs: finds within-cluster near-dups, never pairs " +
      "across cells, ids ordered") {
    val r = Similarity.semDedupPairs(clustered, "vec_id", "embedding",
        nCells = 2, trainIters = 2, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(r.contains((1L, 2L)) && r.contains((10L, 11L)))
    // no pair joins the two orthogonal clusters, and id_a < id_b
    r.foreach { case (a, b) =>
      assert(a < b)
      assert((a < 10L) == (b < 10L), s"cross-cluster pair ($a,$b)")
    }
  }

  test("cellsForOccupancy holds cell occupancy constant as rows grow (VERDICT r9 #7)") {
    // unit-circle corpus at n and 4n rows; nCells derives from the
    // helper, so mean occupancy is ~target at BOTH sizes and the
    // realized max stays within a small multiple — at FIXED nCells the
    // 4n max would be ~4× instead
    def circle(n: Int) = (0 until n).map { i =>
      val th = 2.0 * math.Pi * i / n
      (i.toLong, Array(math.cos(th).toFloat, math.sin(th).toFloat))
    }.toDF("vec_id", "embedding")
    val target = 30
    val occ = Seq(240, 960).map { n =>
      val corpus = circle(n)
      val nCells = Similarity.cellsForOccupancy(n.toLong, target)
      assert(nCells == n / target)
      val cent = Similarity.kmeansFit(corpus, "vec_id", "embedding", nCells)
      val sizes = Similarity.assignCells(corpus, "vec_id", "embedding", cent)
        .groupBy("cell").count().as[(Long, Long)].collect().map(_._2)
      (sizes.sum.toDouble / nCells, sizes.max)
    }
    occ.foreach { case (mean, max) =>
      assert(mean == target.toDouble, s"mean occupancy $mean != $target")
      assert(max <= 4L * target, s"max occupancy $max blew past 4×target")
    }
  }

  test("balancedCells: √N occupancy past the floor, constant below it (r11)") {
    import graft.operators.Similarity
    // below minOccupancy² rows the floor rules: same cells as the
    // constant-occupancy dial (the declared queries are test-scale
    // invariant under the switch)
    assert(Similarity.balancedCells(500, 32) ==
      Similarity.cellsForOccupancy(500, 32))
    assert(Similarity.balancedCells(500, 32) == 16)
    // past the floor, occupancy tracks ⌈√n⌉ so BOTH terms are N^1.5:
    // nCells = ⌈n/⌈√n⌉⌉ ≈ √n — at 100× rows, cells grow ~10×, not 100×
    val c1 = Similarity.balancedCells(20000, 32)   // ⌈√20000⌉=142
    val c2 = Similarity.balancedCells(2000000, 32) // ⌈√2e6⌉=1415
    assert(c1 == 141 && c2 == 1414, s"($c1, $c2)")
    // perfect square boundary: IEEE sqrt is exact, no off-by-one
    assert(Similarity.balancedCells(1048576, 1) == 1024)
    // cap still applies
    assert(Similarity.balancedCells(Long.MaxValue / 4, 1) == (1 << 20))
  }

  test("semDedupPairs: capBuckets drops an oversize cell entirely") {
    // every vector identical → one cell holds everything; cap below
    // the cell size must produce zero pairs (and not a b² explosion)
    val flood = (0L until 50L).map(i => (i, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.semDedupPairs(flood, "vec_id", "embedding",
      nCells = 2, trainIters = 1, threshold = 0.5, maxCell = 10)
    assert(r.count() == 0L)
  }

  // ----- Decay.decayedSum ----------------------------------------------

  test("decayedSum: hand-computed staircase weights, forgetting window, " +
      "and future-row exclusion") {
    val ev = Seq(
      (1L, "2024-01-30 10:00:00", 4.0),   // age 1d → w=1/2 → 2.0
      (1L, "2024-01-29 23:00:00", 8.0),   // age 2d → w=1/4 → 2.0
      (1L, "2024-01-05 00:00:00", 100.0), // age 26d > 20 halflives → 0
      (1L, "2024-02-01 00:00:00", 999.0), // after the anchor → excluded
      (2L, "2024-01-31 00:00:00", 7.0),   // at the anchor → excluded
      (2L, "2024-01-30 00:00:00", 6.0))   // age 1d → 3.0
      .toDF("user_id", "ts_s", "v")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val r = graft.operators.Decay.decayedSum(
        ev, "user_id", "ts", "v", asOfDate = "2024-01-31", halflifeDays = 1)
      .orderBy("user_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(r == Seq((1L, 2L, 4.0), (2L, 1L, 3.0)))
  }

  test("decayedSum: halflife groups days into staircase steps") {
    // halflife 2: ages 1..2 → e=0 (for age 2: floor(2/2)=1... age 1:
    // floor(1/2)=0 → w=1; age 2: e=1 → w=1/2; age 4: e=2 → w=1/4
    val ev = Seq(
      (1L, "2024-01-30 00:00:00", 8.0),   // age 1 → e=0 → 8.0
      (1L, "2024-01-29 00:00:00", 8.0),   // age 2 → e=1 → 4.0
      (1L, "2024-01-27 00:00:00", 8.0))   // age 4 → e=2 → 2.0
      .toDF("user_id", "ts_s", "v")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val r = graft.operators.Decay.decayedSum(
        ev, "user_id", "ts", "v", asOfDate = "2024-01-31", halflifeDays = 2)
      .as[(Long, Long, Double)].collect().toSeq
    assert(r == Seq((1L, 3L, 14.0)))
  }

  // ----- q_temperature_sample invariants -------------------------------

  test("temperature sampling: rates in (0, 1], kept within bounds, " +
      "and deterministic across runs") {
    val run = () => SparkEntry.queries("q_temperature_sample")(spark, sf)
      .as[(String, Long, Double, Long, Double)].collect().toSeq
    val a = run()
    assert(a.nonEmpty)
    a.foreach { case (src, nDocs, rate, nKept, realized) =>
      assert(rate > 0.0 && rate <= 1.0, s"$src rate=$rate")
      assert(nKept >= 0L && nKept <= nDocs, s"$src kept=$nKept of $nDocs")
      assert(realized >= 0.0 && realized <= 1.0)
    }
    // hash-keyed membership is a pure function of the data
    assert(a == run())
  }
}
