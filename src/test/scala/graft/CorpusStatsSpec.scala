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

  test("topTerms: tokenization trims, lowercases, drops empties") {
    val docs = Seq((1L, "  Foo  foo\tBAR \n")).toDF("id", "text")
    val got = CorpusStats.topTerms(docs, "id", "text", k = 10)
      .as[(Long, String, Long, Long, Long, Int)].collect()
    assert(got.map(_._2).sorted.toSeq == Seq("bar", "foo"))
    assert(got.find(_._2 == "foo").get._3 == 2L)
  }
}
