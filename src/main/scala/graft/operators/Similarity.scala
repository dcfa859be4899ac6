package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query
  * set against the corpus, one fused map-side pass, per-query top-k via
  * window. No corpus shuffle at all: at 100 TB the corpus streams
  * through once and only |queries|×k rows survive to the exchange.
  *
  * Scale path: signed-random-projection LSH buckets
  * ([[VectorFns.signBucket]]) — corpus bucketed once (map-side key),
  * queries probe their own bucket; recall traded for a |corpus|/2^bits
  * candidate fraction.
  */
object Similarity {

  /** Brute-force exact top-k cosine neighbors for each query vector.
    * `queries` must be broadcast-sized. Self-matches excluded. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(VectorFns.cosineFast(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** LSH-bucketed ANN: candidates limited to the query's sign-projection
    * bucket. Same output shape as [[bruteForceTopK]]; approximate
    * (bucket-local) recall. */
  def bucketedTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, nBits: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorFns.signBucket(col(vecCol), nBits).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      VectorFns.signBucket(col(vecCol), nBits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(VectorFns.cosineFast(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: bucketed self-join, pairs
    * above `threshold`. The verify stage of embedding-level dedup. */
  def embeddingNearDups(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int = 8): DataFrame = {
    val b = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorFns.signBucket(col(vecCol), nBits).as("bucket"))
    val l = b.as("l"); val r = b.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .withColumn("sim", round(VectorFns.cosineFast(col("l.v"), col("r.v")), 6))
      .filter(col("sim") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("sim"))
  }
}
