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

  /** ±1 sign for projection cell (seed, j, i): the top bit of the first
    * md5 nibble of "seed:j:i" — replays in SQL as
    * `substr(md5(seed || ':' || j || ':' || i), 1, 1) BETWEEN '0' AND
    * '7'`. Driver-side (the sign matrix is data-independent). */
  private[graft] def projSign(seed: String, j: Int, i: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$j:$i".getBytes("UTF-8"))
    if ((h(0) & 0x80) == 0) 1 else -1
  }

  /** Johnson-Lindenstrauss signed random projection: inDim floats →
    * outDim exact integers, out[j] = Σᵢ s(j,i)·round(vᵢ·scale), with
    * the ±1 sign matrix derived from md5 (Achlioptas 2003's database-
    * friendly projection, the dimensionality-reduction step ahead of
    * ANN/clustering at 100 TB — outDim/inDim of the vector bytes move
    * through every downstream exchange).
    *
    * Engineering contract: the signs are computed DRIVER-side (m×d md5
    * calls, data-independent) and ride the plan as one array literal,
    * so the per-row cost is outDim integer dot products — map-side,
    * codegen'd, zero shuffle, no per-row hashing. Fixed-point
    * `round(v·scale)` keeps every output an exact BIGINT: float→double
    * promotion is exact and a 24-bit float mantissa times a ≤2²⁰ scale
    * stays inside double's 53 bits, so both engines round the SAME
    * double and the projection is bit-identical cross-engine. */
  def randomProject(v: Column, inDim: Int, outDim: Int, seed: String,
      scale: Double = 1e6): Column = {
    require(inDim > 0 && outDim > 0, s"dims $inDim->$outDim")
    val signs = (0 until outDim).map(j =>
      (0 until inDim).map(i => projSign(seed, j, i)))
    val fixv = transform(dbl(v), x => round(x * lit(scale), 0).cast("long"))
    transform(typedLit(signs), row =>
      aggregate(zip_with(row, fixv, (s, x) => s.cast("long") * x),
        lit(0L), (acc, x) => acc + x))
  }
}
