package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Profile, Scd2}

/** Specs for the r5 pipeline additions: SCD2 history build, table
  * profiling, bigram collocations. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def log = Seq(
    // user 1: A A B B A  → changes at id 1 (A), 3 (B), 5 (A)
    (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "B"), (1L, 4L, "B"), (1L, 5L, "A"),
    // user 2: single snapshot → one open interval
    (2L, 6L, "X"),
    // user 3: null → value → null (null-safe change detection)
    (3L, 7L, null), (3L, 8L, "Y"), (3L, 9L, null))
    .toDF("user_id", "rec_id", "state")
    .withColumn("ts", timestamp_seconds(col("rec_id") * 100))

  test("scd2 history compacts no-change snapshots and closes intervals") {
    val h = Scd2.history(log, "user_id", "ts", "rec_id", Seq("state"))
      .orderBy("user_id", "rec_id")
      .select("user_id", "rec_id", "state", "is_current")
      .as[(Long, Long, Option[String], Boolean)].collect().toSeq
    assert(h == Seq(
      (1L, 1L, Some("A"), false), (1L, 3L, Some("B"), false),
      (1L, 5L, Some("A"), true),
      (2L, 6L, Some("X"), true),
      (3L, 7L, None, false), (3L, 8L, Some("Y"), false),
      (3L, 9L, None, true)))
  }

  test("scd2 intervals chain: valid_to equals the next change's valid_from") {
    val h = Scd2.history(log, "user_id", "ts", "rec_id", Seq("state"))
      .filter(col("user_id") === 1L).orderBy("rec_id")
      .select(col("valid_from").cast("long"), col("valid_to").cast("long"))
      .as[(Long, Option[Long])].collect().toSeq
    assert(h == Seq((100L, Some(300L)), (300L, Some(500L)), (500L, None)))
  }

  test("scd2 runs on a single exchange (compaction + lead share the sort)") {
    val plan = Scd2.history(log, "user_id", "ts", "rec_id", Seq("state"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("profile reports nulls, exact distincts, native-order min/max") {
    val df = Seq(
      (Some(10L), Some(2.5), Some("b")),
      (Some(9L), None, Some("a")),
      (Some(10L), Some(1.25), None))
      .toDF("k", "v", "s")
    val p = Profile.profile(df)
      .select("col_name", "n_rows", "n_nulls", "n_distinct", "min_s", "max_s")
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().toSeq
    assert(p == Seq(
      ("k", 3L, 0L, 2L, Some("9"), Some("10")), // native min: 9 < 10
      ("s", 3L, 1L, 2L, Some("a"), Some("b")),
      ("v", 3L, 1L, 2L, Some("1.250000"), Some("2.500000"))))
  }

  test("profile is a single job: one aggregate, no per-column scans") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("a", "b")
    val plan = Profile.profile(df).queryExecution.executedPlan.toString
    // multiple countDistinct plan through one Expand feeding one
    // aggregate chain — the scan must appear exactly once
    assert("LocalTableScan".r.findAllIn(plan).length == 1, plan)
  }

  test("collocations rank by count and score by exact rational lift") {
    val docs = Seq(
      (0L, "new york new york city"),
      (1L, "york new york is big"),
      (2L, "big city big city big")).toDF("doc_id", "text")
    val out = CorpusStats.collocations(docs, "text", 3)
      .orderBy("rank")
      .select("bg", "cnt", "lift")
      .as[(String, Long, Double)].collect().toSeq
    // token counts (15 total): new=3 york=4 city=3 big=4 is=1
    // "new york" appears 3× → lift = 3·15/(3·4) = 3.75
    assert(out.head == ("new york", 3L, 3.75))
    assert(out.map(_._1).distinct.length == 3)
  }

  test("collocations of a sub-2-token doc are empty, not an error") {
    val docs = Seq((0L, "solo"), (1L, "")).toDF("doc_id", "text")
    assert(CorpusStats.collocations(docs, "text", 5).count() == 0)
  }
}
