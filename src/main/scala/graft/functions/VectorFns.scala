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

  /** Scalar 8-bit quantization (SQ8) over a declared [lo, hi] range —
    * the memory/bandwidth scale dial for similarity search: codes are
    * 1 byte per dimension (4× smaller than float32), so a 100 TB
    * corpus's vectors fit 4× more per executor and per cache line,
    * at a bounded reconstruction error of (hi-lo)/512 per dimension
    * (mid-rise dequantization). All arithmetic is plain IEEE double
    * (`floor`/clamp/multiply by an exact power-of-two step for the
    * default [-1,1]), so DuckDB replays codes and reconstructions
    * bit-for-bit. Out-of-range values saturate to 0/255. */
  def quantizeSq8(v: Column, lo: Double = -1.0, hi: Double = 1.0): Column =
    transform(dbl(v), x =>
      greatest(lit(0.0), least(lit(255.0),
        floor((x - lit(lo)) * lit(256.0 / (hi - lo))))).cast("int"))

  /** Mid-rise reconstruction of [[quantizeSq8]] codes: lo + (c+0.5)·step. */
  def dequantizeSq8(codes: Column, lo: Double = -1.0, hi: Double = 1.0): Column =
    transform(codes, c =>
      lit(lo) + (c.cast("double") + lit(0.5)) * lit((hi - lo) / 256.0))

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
