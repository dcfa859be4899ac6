package graft

import graft.operators.CorpusStats

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("topTerms: known corpus — tf, df, rational score, rank order") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry durian")).toDF("id", "text")
    val got = CorpusStats.topTerms(docs, "id", "text", k = 2)
      .as[(Long, String, Long, Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._6)).toMap

    // N=3 → (N+1)*1e6 = 4_000_000. idf(df) = 4_000_000 div (df+1):
    // df=1 → 2_000_000, df=2 → 1_333_333.
    val d1 = got(1L)
    assert(d1(0) == ((1L, "apple", 2L, 1L, 4000000L, 1)))   // tf=2, df=1
    assert(d1(1) == ((1L, "banana", 1L, 2L, 1333333L, 2)))
    val d3 = got(3L)
    assert(d3(0) == ((3L, "cherry", 3L, 2L, 3999999L, 1)))  // 3*1333333
    assert(d3(1) == ((3L, "durian", 1L, 1L, 2000000L, 2)))
    // doc 2: equal scores (both df=2, tf=1) → term-asc tie-break
    assert(got(2L).map(t => (t._2, t._6)).toSeq ==
      Seq(("banana", 1), ("cherry", 2)))
  }

  test("heavyHitters: exact counts, rank order, corpus mass") {
    val docs = Seq(
      (1L, "x x x y"),
      (2L, "y z x"),
      (3L, "z x")).toDF("id", "text")
    val got = CorpusStats.heavyHitters(docs, "text", 2)
      .as[(Int, String, Long, Double)].collect().toSeq
    // x:5 y:2 z:2 of 9 total; y before z on term-asc tie-break
    assert(got == Seq((1, "x", 5L, 0.555556), (2, "y", 2L, 0.222222)))
  }

  test("count-min sketch estimates bound the exact heavy-hitter counts") {
    // The sketch scale path: estimate(t) >= true(t) always (collisions
    // only inflate), and <= true(t) + eps*N with confidence 1-delta.
    import org.apache.spark.sql.functions._
    val docs = (1 to 50).map(i =>
      (i.toLong, s"common filler${i % 17} rare$i common common")).toDF("id", "text")
    val terms = docs.select(
      explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
    val eps = 0.01
    val sketchBytes = terms
      .select(count_min_sketch(col("term"), lit(eps), lit(0.99), lit(42))
        .as("s")).head().getAs[Array[Byte]]("s")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val exact = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    exact.foreach { case (t, c) =>
      val est = cms.estimateCount(t)
      assert(est >= c, s"CMS underestimated $t: $est < $c")
      assert(est <= c + (eps * n).ceil.toLong,
        s"CMS overestimate for $t out of eps bound: $est vs $c (N=$n)")
    }
  }

  test("topTerms: tokenization trims, lowercases, drops empties") {
    val docs = Seq((1L, "  Foo  foo\tBAR \n")).toDF("id", "text")
    val got = CorpusStats.topTerms(docs, "id", "text", k = 10)
      .as[(Long, String, Long, Long, Long, Int)].collect()
    assert(got.map(_._2).sorted.toSeq == Seq("bar", "foo"))
    assert(got.find(_._2 == "foo").get._3 == 2L)
  }
}
