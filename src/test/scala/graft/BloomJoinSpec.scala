package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin ≡ plain left-semi join (false positives scrubbed)") {
    val ord = Tables.orders(spark, sf)
    val cust = Tables.customer(spark, sf)
      .filter($"c_mktsegment" === "BUILDING")
    val got = BloomJoin.bloomSemiJoin(ord, cust, "o_custkey", "c_custkey")
      .select($"o_orderkey").as[Long].collect().sorted.toSeq
    val want = ord.join(cust, ord("o_custkey") === cust("c_custkey"),
        "left_semi")
      .select($"o_orderkey").as[Long].collect().sorted.toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("mightContain predicate admits every true key (no false negatives)") {
    val small = (1L to 100L).map(i => i * 7).toDF("k")
    val pred = BloomJoin.mightContainIn(small, "k")(col("k"))
    val bigTrue = (1L to 100L).map(i => i * 7).toDF("k")
    assert(bigTrue.filter(pred).count() == 100,
      "bloom filters never have false negatives")
    // non-members are MOSTLY dropped (fpp-bounded, not exact)
    val bigFalse = (1L to 10000L).map(i => i * 7 + 3).toDF("k")
    val kept = bigFalse.filter(pred).count()
    assert(kept < 1000, s"bloom prefilter kept $kept/10000 non-members")
  }

  test("broadcast-size contract is enforced fail-fast") {
    val small = (1L to 10L).toDF("k")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.mightContainIn(small, "k", maxKeys = 5)(col("k"))
    }
    assert(e.getMessage.contains("shuffle-join instead"))
  }
}
