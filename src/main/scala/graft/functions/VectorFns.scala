package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column operators.
  *
  * Two tiers:
  *  - declarative forms built on higher-order functions (`zip_with` +
  *    `aggregate`) — Catalyst-optimizable and DuckDB-oracle-comparable,
  *    used by the declared queries;
  *  - [[CosineSim]], a native Catalyst expression with `doGenCode`
  *    (graft.plans), for the brute-force ANN hot loop where the HOF
  *    form's per-element lambda dispatch costs real time at 100 TB.
  */
object VectorFns {

  private def dbl(c: Column): Column = c.cast("array<double>")

  /** Sequential left-fold dot product — same accumulation order as
    * DuckDB's list functions, so rounded results hash-match. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(dbl(a), dbl(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in declarative form. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine via the codegen'd native expression (hot path). */
  def cosineFast(a: Column, b: Column): Column =
    graft.plans.CosineSim.column(dbl(a), dbl(b))

  /** Deterministic signed-random-projection bucket for LSH-style ANN:
    * the sign bits of the first `nBits` components, packed to a long.
    * Cheap, broadcast-free, and stable across engines (pure
    * arithmetic). Vectors in the same bucket are cosine-close
    * candidates; search within bucket ∪ neighbor buckets. */
  def signBucket(v: Column, nBits: Int): Column =
    (0 until nBits).map { i =>
      (when(element_at(dbl(v), i + 1) > 0, lit(1L)).otherwise(lit(0L)) *
        lit(1L << i))
    }.reduce(_ + _)
}
