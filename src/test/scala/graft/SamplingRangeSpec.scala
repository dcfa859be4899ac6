package graft

import org.apache.spark.sql.functions._

import graft.operators.{RangeJoin, Sampling}

class SamplingRangeSpec extends SparkSpec {
  import spark.implicits._

  test("hash sample: rate tracks fraction, membership is key-stable") {
    val df = (1L to 10000L).toDF("id")
    val n = Sampling.sampleByHash(df, $"id", 0.2, "s1").count()
    // 48-bit uniform hash: 10k draws at p=0.2, ±5σ ≈ ±200
    assert(math.abs(n - 2000L) < 200, s"got $n")

    val a = Sampling.sampleByHash(df, $"id", 0.2, "s1").as[Long].collect().toSet
    val b = Sampling.sampleByHash(df.repartition(7), $"id", 0.2, "s1")
      .as[Long].collect().toSet
    assert(a == b, "membership must not depend on partition layout")
    val c = Sampling.sampleByHash(df, $"id", 0.2, "other-seed")
      .as[Long].collect().toSet
    assert(a != c, "different seed draws a different sample")
  }

  test("hash sample: fraction 0 and 1 are empty and total") {
    val df = (1L to 100L).toDF("id")
    assert(Sampling.sampleByHash(df, $"id", 0.0).count() == 0)
    assert(Sampling.sampleByHash(df, $"id", 1.0).count() == 100)
  }

  test("weighted sample: per-row rate tracks fraction, degenerate rows handled") {
    val df = (1L to 10000L).toDF("id")
      .withColumn("frac", when($"id" % 2 === 0, 0.8).otherwise(0.1))
    val kept = Sampling.sampleWeighted(df, $"id", $"frac", "w1")
      .as[(Long, Double)].collect().map(_._1)
    val evens = kept.count(_ % 2 == 0); val odds = kept.count(_ % 2 == 1)
    // 5k draws each: 0.8 ±5σ≈141, 0.1 ±5σ≈106
    assert(math.abs(evens - 4000) < 150, s"evens $evens")
    assert(math.abs(odds - 500) < 110, s"odds $odds")
    // per-row fraction agrees with the constant-fraction predicate
    val viaConst = Sampling.sampleByHash(df.filter($"id" % 2 === 1), $"id", 0.1, "w1")
      .select("id").as[Long].collect().toSet
    assert(kept.filter(_ % 2 == 1).toSet == viaConst,
      "weighted predicate must equal hashKeep at the same fraction")
    // degenerate rows: >=1 always kept, <=0 and null never
    val edge = Seq((1L, 1.0), (2L, 1.7), (3L, 0.0), (4L, -0.5))
      .toDF("id", "frac")
      .unionByName(Seq(5L).toDF("id").withColumn("frac", lit(null).cast("double")))
    val got = Sampling.sampleWeighted(edge, $"id", $"frac", "w1")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L), s"degenerate handling: $got")
  }

  test("hash split is disjoint and exhaustive, nested samples agree") {
    val df = (1L to 5000L).toDF("id")
    val (tr, te) = Sampling.splitByHash(df, $"id", 0.8, "split")
    val (trIds, teIds) =
      (tr.as[Long].collect().toSet, te.as[Long].collect().toSet)
    assert((trIds & teIds).isEmpty && trIds.size + teIds.size == 5000)
    // Thresholds nest: a 10% sample is a subset of the 30% sample —
    // the property that lets you grow a sample without resampling.
    val s10 = Sampling.sampleByHash(df, $"id", 0.1).as[Long].collect().toSet
    val s30 = Sampling.sampleByHash(df, $"id", 0.3).as[Long].collect().toSet
    assert(s10.subsetOf(s30))
  }

  test("stratified sample: per-stratum rates, default drops, full keeps") {
    val df = (1L to 9000L).map(i => (i, Seq("a", "b", "c")(i.toInt % 3)))
      .toDF("id", "s")
    val kept = Sampling.sampleStratified(df, $"id", $"s",
        Map("a" -> 0.1, "b" -> 1.0), defaultFraction = 0.0, seed = "t")
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(kept("b") == 3000L, "fraction 1.0 keeps the whole stratum")
    assert(!kept.contains("c"), "unlisted stratum falls to defaultFraction 0")
    assert(math.abs(kept("a") - 300L) < 120, s"got ${kept("a")}")
    // membership within a stratum matches the flat sampler (same seed)
    val flat = Sampling.sampleByHash(df.where($"s" === "a"), $"id", 0.1, "t")
      .select("id").as[Long].collect().toSet
    val strat = Sampling.sampleStratified(df, $"id", $"s",
        Map("a" -> 0.1), seed = "t")
      .select("id").as[Long].collect().toSet
    assert(strat == flat)
  }

  test("k-fold: partition of the key space, leak-proof, nests with hashKeep") {
    val keys = (0L until 4000L).toDF("k")
    val folded = keys.withColumn("fold", Sampling.foldId(col("k"), 5, "s"))
    val byFold = folded.groupBy("fold").count()
      .as[(Int, Long)].collect().toMap
    // every fold populated, all rows assigned exactly once (fold is a
    // single deterministic CASE — one fold per row by construction)
    assert(byFold.keySet == Set(0, 1, 2, 3, 4))
    assert(byFold.values.sum == 4000L)
    // roughly balanced (hash uniformity; generous 4-sigma-ish bound)
    assert(byFold.values.forall(n => n > 600 && n < 1000), s"skewed: $byFold")
    // same key → same fold on a re-derived frame (pure function of data)
    val again = keys.withColumn("fold", Sampling.foldId(col("k"), 5, "s"))
      .as[(Long, Int)].collect().toMap
    assert(folded.as[(Long, Int)].collect().toMap == again)
    // fold 0 at k=5 IS the 20% hashKeep sample (same cuts, same space)
    val viaKeep = keys.where(Sampling.hashKeep(col("k"), 0.2, "s"))
      .as[Long].collect().toSet
    val fold0 = folded.filter(col("fold") === 0).select("k")
      .as[Long].collect().toSet
    assert(fold0 == viaKeep)
  }

  test("range join: differential vs naive range predicate") {
    // Pseudo-random points and intervals across 3 users; intervals span
    // 0-3 bins at binWidth=10 so multi-bin explode paths are exercised.
    val points = (0 until 400).map { i =>
      (i % 3, i.toLong, (i * 7919L) % 1000)
    }.toDF("uid", "pid", "p")
    val ivals = (0 until 120).map { i =>
      val s = (i * 104729L) % 1000
      (i % 3, 1000L + i, s, s + 1 + (i * 31L) % 30)
    }.toDF("uid", "iid", "lo", "hi")

    val got = RangeJoin.pointInInterval(points, ivals, "p", "lo", "hi",
        Seq("uid"), binWidth = 10L)
      .select("uid", "pid", "iid").as[(Int, Long, Long)].collect().toSet
    val want = points.join(ivals, Seq("uid"))
      .where($"p" >= $"lo" && $"p" < $"hi")
      .select("uid", "pid", "iid").as[(Int, Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("interval overlap join: differential vs naive theta-join, exactly-once") {
    // pseudo-random spans across 3 users, 0-4 bins wide at binWidth=10,
    // so multi-bin pairs exercise the canonical-bin dedup-free path
    val a = (0 until 120).map { i =>
      val s = (i * 7919L) % 500
      (i % 3, i.toLong, s, s + 1 + (i * 13L) % 40)
    }.toDF("uid", "aid", "as", "ae")
    val b = (0 until 90).map { i =>
      val s = (i * 104729L) % 500
      (i % 3, 1000L + i, s, s + 1 + (i * 17L) % 40)
    }.toDF("uid", "bid", "bs", "be")
    val gotAll = RangeJoin.intervalOverlap(a, b, "as", "ae", "bs", "be",
        Seq("uid"), binWidth = 10L)
      .select("uid", "aid", "bid").as[(Int, Long, Long)].collect().toSeq
    // exactly-once: no pair may appear twice even when it shares many bins
    assert(gotAll.size == gotAll.toSet.size, "pair emitted more than once")
    val want = a.join(b, Seq("uid"))
      .where($"as" < $"be" && $"bs" < $"ae")
      .select("uid", "aid", "bid").as[(Int, Long, Long)].collect().toSet
    assert(gotAll.toSet == want && want.nonEmpty)
  }

  test("interval overlap join: fractional bounds cover the overhang bin (ADVICE r10)") {
    // [19.5, 20.3) at binWidth 10 covers bins 1 AND 2 — the old
    // bin(end − 1) last-bin formula exploded only bin 1 and silently
    // dropped any overlap whose intersection starts in bin 2, e.g.
    // against [20.0, 25.0); ceil(end/W) − 1 covers both. Also:
    // sub-unit spans must not produce a descending sequence.
    val a = Seq((1, 10L, 19.5, 20.3), (1, 11L, 20.05, 20.10))
      .toDF("uid", "aid", "as", "ae")
    val b = Seq((1, 100L, 20.0, 25.0), (1, 101L, 19.0, 19.6))
      .toDF("uid", "bid", "bs", "be")
    val got = RangeJoin.intervalOverlap(a, b, "as", "ae", "bs", "be",
        Seq("uid"), binWidth = 10L)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    val want = a.join(b, Seq("uid"))
      .where($"as" < $"be" && $"bs" < $"ae")
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(want == Set((10L, 100L), (10L, 101L), (11L, 100L)))
    assert(got == want)
  }

  test("interval overlap join: touching endpoints do not overlap; empty spans drop") {
    val a = Seq((1, 10L, 0L, 20L), (1, 11L, 50L, 50L)).toDF("uid", "aid", "as", "ae")
    val b = Seq((1, 100L, 20L, 30L), (1, 101L, 19L, 21L)).toDF("uid", "bid", "bs", "be")
    val got = RangeJoin.intervalOverlap(a, b, "as", "ae", "bs", "be",
        Seq("uid"), binWidth = 10L)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    // [0,20) touches [20,30) at the endpoint → no match; [19,21) overlaps
    assert(got == Set((10L, 101L)))
  }

  test("range join: end is exclusive, start inclusive, bin-boundary safe") {
    val points = Seq((1, 10L, 20L), (1, 11L, 29L), (1, 12L, 30L))
      .toDF("uid", "pid", "p") // 20 on start, 30 on exclusive end
    // the (hi < lo) interval must be dropped, not explode a huge
    // descending bin sequence
    val ivals = Seq((1, 100L, 20L, 30L), (1, 101L, 1000000L, 0L))
      .toDF("uid", "iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivals, "p", "lo", "hi",
        Seq("uid"), binWidth = 10L)
      .select("pid").as[Long].collect().sorted
    assert(got.toSeq == Seq(10L, 11L))
  }
}
