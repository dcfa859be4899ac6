package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.Sources

/** File-source round-trips (SURVEY.md §2.B scans row): declared-schema
  * JSON/CSV line readers + parquet, including the FAILFAST corrupt-row
  * stance. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL(
    "id BIGINT, name STRING, score DOUBLE")

  test("jsonLines reads declared schema; no inference pass") {
    val dir = tmpDir("jsonsrc")
    Files.writeString(Paths.get(dir, "a.jsonl"),
      """{"id": 1, "name": "alpha", "score": 0.5}
        |{"id": 2, "name": "beta", "score": 1.25}
        |""".stripMargin)
    val got = Sources.jsonLines(spark, dir, schema)
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "alpha", 0.5), (2L, "beta", 1.25)))
  }

  test("jsonLines FAILFAST surfaces corrupt rows") {
    val dir = tmpDir("jsonbad")
    Files.writeString(Paths.get(dir, "bad.jsonl"),
      "{\"id\": 1, \"name\": \"ok\", \"score\": 1.0}\nnot json at all\n")
    val e = intercept[org.apache.spark.SparkException] {
      Sources.jsonLines(spark, dir, schema).collect()
    }
    assert(e.getMessage.contains("FAILFAST")
      || Option(e.getCause).exists(_.getMessage.contains("Malformed")))
  }

  test("csv reads declared schema with header") {
    val dir = tmpDir("csvsrc")
    Files.writeString(Paths.get(dir, "a.csv"),
      "id,name,score\n1,alpha,0.5\n2,beta,1.25\n")
    val got = Sources.csv(spark, dir, schema)
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "alpha", 0.5), (2L, "beta", 1.25)))
  }

  test("csv/json filters push down to the scan") {
    val dir = tmpDir("csvpush")
    Files.writeString(Paths.get(dir, "a.csv"), "id,name,score\n1,a,0.5\n")
    val plan = Sources.csv(spark, dir, schema)
      .filter($"id" === 1).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,1)]"),
      s"expected pushed filters in:\n$plan")
  }

  test("orc round-trips, prunes columns, and pushes filters") {
    val dir = tmpDir("orcsrc")
    Seq((1L, "alpha", 0.5), (2L, "beta", 1.25), (3L, "gamma", 2.0))
      .toDF("id", "name", "score")
      .write.mode("overwrite").orc(dir)
    val got = Sources.orc(spark, dir, Some(schema))
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "alpha", 0.5), (2L, "beta", 1.25), (3L, "gamma", 2.0)))
    val plan = Sources.orc(spark, dir)
      .select("id", "score").filter($"id" > 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<id:bigint,score:double>"),
      s"expected pruned ReadSchema in:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"),
      s"expected pushed filters in:\n$plan")
  }
}
