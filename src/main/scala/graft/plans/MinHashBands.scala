package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash + LSH banding over an `array<string>` shingle column:
  * returns `array<string>` of length `bands`, element b = a 12-hex-char
  * bucket id derived from that band's `rows` min-hashes. Docs sharing
  * any band value are near-dup candidates (the classic banding scheme).
  *
  * ENGINE-REPLAYABLE hashes (the [[WinnowFps]] trick, extended): the
  * per-shingle base value is the 48-bit integer behind the first 12 hex
  * chars of md5(shingle); hash function j is the affine map
  * `(a_j·(x mod P) + b_j) mod P` over the Mersenne prime P = 2³¹−1 with
  * `a_j = ((j+1)·2654435761) mod P`, `b_j = (j·2654435769) mod P` —
  * multiplier constants from Knuth's multiplicative method, derived in
  * closed form from j so an external SQL engine can replay every hash
  * with md5 + integer arithmetic alone (no engine-private hash). The
  * band bucket is the 12-hex md5 prefix of the rows' zero-padded
  * decimal min-hashes concatenated in order — 12 bytes riding the
  * exchange per (doc, band) regardless of `rows`. The mod-P wrap is
  * what keeps the k functions independent: an unwrapped affine map
  * would make every h_j pick the argmin-x shingle, collapsing the
  * sketch to one effective hash function.
  *
  * Why native: the HOF formulation (`bands*rows` separate
  * `array_min(transform(sh, …))` columns) re-evaluates the shingle
  * expression once per hash function after Catalyst collapses the
  * projections — at 16 hashes that made the LSH stage ~16× the cost of
  * the corpus scan. Here each shingle is digested exactly once (one
  * MD5, reused MessageDigest) and the k derived hashes are one
  * multiply+mod each, fused into a single loop.
  */
case class MinHashBands(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  // tokens/shingles must be array<string>; declared so SQL misuse
  // fails (or casts) at analysis time, not via runtime ClassCast
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"${MinHashBands.getClass.getName.stripSuffix("$")}$$.MODULE$$" +
        s".compute($a, $bands, $rows)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashBands {
  /** Mersenne prime 2³¹−1: the hash field. Products a_j·x stay under
    * 2⁶² — exact in a signed 64-bit long AND in any SQL engine's
    * big-integer arithmetic, which is what makes the scheme
    * replayable. */
  val P: Long = 2147483647L

  /** Knuth's multiplicative constant (≈ 2³²/φ) — seeds the per-j
    * multipliers. */
  val MulA: Long = 2654435761L

  /** Offset seed for the per-j addends (0x9E3779B9). */
  val MulB: Long = 2654435769L

  private val HexDigits = "0123456789abcdef".toCharArray

  /** One digest per thread, not one per row — getInstance runs a
    * provider lookup + allocation, pure overhead inside a corpus-sized
    * scan (review r7). */
  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Per-k affine coefficient tables (a_j, b_j) — loop-invariant across
    * every shingle of every row, so computing them per (shingle, j)
    * was two multiplies + two mods of pure waste in the innermost loop
    * (review r7). One entry per distinct k ever used in the session. */
  private val CoefCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coefs(k: Int): (Array[Long], Array[Long]) =
    CoefCache.computeIfAbsent(k, k2 => {
      val a = new Array[Long](k2); val b = new Array[Long](k2)
      var j = 0
      while (j < k2) { a(j) = ((j + 1) * MulA) % P; b(j) = (j * MulB) % P; j += 1 }
      (a, b)
    })

  /** 48-bit integer behind md5(s)'s first 12 hex chars (= first 6
    * digest bytes, big-endian). */
  def md5Prefix48(md: java.security.MessageDigest, s: UTF8String): Long = {
    md.reset()
    md.update(s.getBytes)
    val d = md.digest()
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** The whole sketch for one document; shared by eval and codegen. */
  def compute(arr: ArrayData, bands: Int, rows: Int): ArrayData = {
    val k = bands * rows
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = Md5.get()
    val (ca, cbArr) = coefs(k)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val xm = md5Prefix48(md, arr.getUTF8String(i)) % P
        var j = 0
        while (j < k) {
          val h = (ca(j) * xm + cbArr(j)) % P
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      // bucket id: md5 prefix of the zero-padded decimal mins in order
      val sb = new java.lang.StringBuilder(rows * 10)
      var r = 0
      while (r < rows) {
        val s = java.lang.Long.toString(mins(b * rows + r))
        var pad = 10 - s.length
        while (pad > 0) { sb.append('0'); pad -= 1 }
        sb.append(s)
        r += 1
      }
      md.reset()
      md.update(sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val d = md.digest()
      val cs = new Array[Char](12)
      var x = 0
      while (x < 6) {
        cs(2 * x) = HexDigits((d(x) >> 4) & 0xf)
        cs(2 * x + 1) = HexDigits(d(x) & 0xf)
        x += 1
      }
      out(b) = UTF8String.fromString(new String(cs))
      b += 1
    }
    new GenericArrayData(out)
  }

  def column(shingles: Column, bands: Int, rows: Int): Column =
    GraftBridge.column(
      MinHashBands(GraftBridge.expression(shingles), bands, rows))
}
