package graft

import org.apache.spark.sql.functions._

import graft.plans.{BoundedTopK, SimHash64}

/** The SQL surface (GraftExtensions via spark.sql.extensions) must
  * resolve to the SAME native expressions as the column API — no UDF
  * fallback, identical results. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("simhash64 callable from SQL, equals the column API") {
    val df = Seq("the quick brown fox", "lorem ipsum dolor")
      .toDF("text").withColumn("toks", split(col("text"), " "))
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT simhash64(toks) AS fp FROM ext_docs ORDER BY fp")
      .as[Long].collect().toSeq
    val viaCol = df.select(SimHash64.column(col("toks")).as("fp"))
      .orderBy("fp").as[Long].collect().toSeq
    assert(viaSql == viaCol && viaSql.distinct.size == 2)
  }

  test("cosine_sim callable from SQL") {
    val sim = spark.sql(
      """SELECT round(cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |                        CAST(array(0.6, 0.8) AS ARRAY<FLOAT>)), 6)
        |       AS sim""".stripMargin).as[Double].head()
    assert(sim == 0.6)
  }

  test("top_k aggregate callable from SQL, equals the column API") {
    val df = (1L to 100L).map(i => (i % 3, i.toDouble % 7, i))
      .toDF("g", "score", "id")
    df.createOrReplaceTempView("ext_scores")
    val viaSql = spark.sql(
      """SELECT g, top_k(score, id, 3) AS top FROM ext_scores
        |GROUP BY g ORDER BY g""".stripMargin).collect().map(_.toString)
    val viaCol = df.groupBy($"g")
      .agg(BoundedTopK.column($"score", $"id", 3).as("top"))
      .orderBy($"g").collect().map(_.toString)
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("winnow_fps callable from SQL, equals the column API") {
    val df = Seq("a common stretch of text that is plenty long", "tiny")
      .toDF("text")
    df.createOrReplaceTempView("ext_winnow")
    val viaSql = spark.sql(
      "SELECT winnow_fps(text, 8, 4) AS fps FROM ext_winnow")
      .as[Seq[String]].collect().toSeq
    val viaCol = df
      .select(graft.functions.TextFns.winnowFingerprints($"text", 8, 4).as("fps"))
      .as[Seq[String]].collect().toSeq
    assert(viaSql == viaCol && viaSql.head.nonEmpty && viaSql(1).isEmpty)
  }

  test("hash_keep callable from SQL, equals the column API") {
    import graft.operators.Sampling
    val df = (1L to 200L).toDF("id")
    df.createOrReplaceTempView("hk_ids")
    val viaSql = spark.sql(
      "SELECT id FROM hk_ids WHERE hash_keep(id, 0.3D, 'seed')")
      .as[Long].collect().toSet
    val viaCol = df.where(Sampling.hashKeep(col("id"), 0.3, "seed"))
      .as[Long].collect().toSet
    assert(viaSql == viaCol && viaSql.nonEmpty)
  }

  test("hash_keep accepts unsuffixed decimal fractions and rejects out-of-range (ADVICE r5)") {
    import graft.operators.Sampling
    val df = (1L to 200L).toDF("id")
    df.createOrReplaceTempView("hk_ids2")
    // Spark SQL parses 0.3 as DECIMAL(1,1); it must select the same
    // rows as 0.3D and the column API
    val viaDec = spark.sql(
      "SELECT id FROM hk_ids2 WHERE hash_keep(id, 0.3, 'seed')")
      .as[Long].collect().toSet
    val viaCol = df.where(Sampling.hashKeep(col("id"), 0.3, "seed"))
      .as[Long].collect().toSet
    assert(viaDec == viaCol && viaDec.nonEmpty)
    // out-of-range fails loudly (same contract as Sampling.hashKeep),
    // instead of silently degenerating to constant TRUE
    val e = intercept[Exception] {
      spark.sql("SELECT id FROM hk_ids2 WHERE hash_keep(id, 1.5, 'seed')").collect()
    }
    assert(e.getMessage.contains("[0, 1]"), s"wrong message: ${e.getMessage}")
    // integer literals spell the boundary fractions naturally
    assert(spark.sql(
      "SELECT count(*) AS n FROM hk_ids2 WHERE hash_keep(id, 1, 'seed')")
      .head().getLong(0) == 200L)
    assert(spark.sql(
      "SELECT count(*) AS n FROM hk_ids2 WHERE hash_keep(id, 0, 'seed')")
      .head().getLong(0) == 0L)
  }

  test("non-literal k is rejected with a clear message") {
    val e = intercept[Exception] {
      spark.sql("SELECT top_k(1.0, 1, id) FROM range(3)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("top_k implicitly casts int score / int id (ADVICE r3)") {
    // ImplicitCastInputTypes (not bare ExpectsInputTypes) is what lets
    // TypeCoercion insert these casts; previously this failed analysis.
    val rows = spark.sql(
      """SELECT top_k(CAST(id % 7 AS INT), CAST(id AS INT), 2) AS top
        |FROM range(20)""".stripMargin).collect()
    assert(rows.length == 1)
    val top = rows(0).getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(_.getDouble(0)) == Seq(6.0, 6.0), "scores coerced to double")
  }
}
