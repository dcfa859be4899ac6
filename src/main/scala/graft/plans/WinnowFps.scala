package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (the MOSS scheme, Schleimer et al.
  * SIGMOD'03): hash every character k-gram of the lowercased text,
  * keep the minimum hash of each w-length window of consecutive
  * k-grams, distinct, sorted — a local-similarity sketch that two
  * documents share wherever they share a run of ≥ k+w-1 characters
  * (winnowing's coverage guarantee), at density ~2/(w+1). Value-based
  * winnowing (min VALUE per window, position ties irrelevant) keeps
  * the selection engine-reproducible: the gram hash is the
  * 12-hex-char md5 prefix compared lexicographically, which DuckDB
  * replays verbatim (`substr(md5(substr(t,i,k)),1,12)` + window
  * `list_min`), so the whole sketch sits under the hash-compare
  * oracle.
  *
  * Why native: the pure-HOF formulation (fold of shifted `slice`s
  * zipped with `least`) is semantically right but interpreter-bound —
  * HOF lambdas don't codegen, every `md5()` call allocates a fresh
  * MessageDigest, and the w window slices re-evaluate the gram array,
  * putting ~20k interpreted expression evals on every row. Here the
  * whole sketch is one tight loop per row: one MessageDigest reused
  * across grams, char-offset table built once (O(len) bytes), O(m·w)
  * 12-byte compares, TreeSet for distinct+sort. ~1 µs-scale per
  * short doc vs ~20 ms interpreted.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1 && w >= 1, s"winnow_fps: k=$k w=$w must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowFps.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${WinnowFps.getClass.getName.stripSuffix("$")}$$.MODULE$$.winnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFps {
  private val HexDigits = "0123456789abcdef".toCharArray

  /** One digest per thread, not one per row (review r7 — same fix as
    * MinHashBands). */
  private[plans] val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** The whole winnow for one document; shared by eval and codegen. */
  def winnow(s0: UTF8String, k: Int, w: Int): ArrayData = {
    val s = s0.toLowerCase // same ASCII-fast lowercase as Spark's lower()
    val n = s.numChars()
    if (n < k + w - 1) return new GenericArrayData(new Array[Any](0))
    val bytes = s.getBytes
    // char-index → byte-offset table, one pass (multi-byte-safe)
    val starts = new Array[Int](n + 1)
    var ci = 0
    var off = 0
    while (ci < n) {
      starts(ci) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      ci += 1
    }
    starts(n) = bytes.length

    val m = n - k + 1 // k-gram count
    val md = WinnowFps.Md5.get()
    val hex = new Array[String](m)
    var g = 0
    while (g < m) {
      md.reset()
      md.update(bytes, starts(g), starts(g + k) - starts(g))
      val d = md.digest()
      val cs = new Array[Char](12)
      var b = 0
      while (b < 6) {
        cs(2 * b) = HexDigits((d(b) >> 4) & 0xf)
        cs(2 * b + 1) = HexDigits(d(b) & 0xf)
        b += 1
      }
      hex(g) = new String(cs)
      g += 1
    }

    // min of each w-window, distinct + sorted (hex is ASCII, so
    // String order == UTF8String binary order == DuckDB varchar order)
    val set = new java.util.TreeSet[String]()
    val nSel = m - w + 1
    var j = 0
    while (j < nSel) {
      var mn = hex(j)
      var t = 1
      while (t < w) {
        if (hex(j + t).compareTo(mn) < 0) mn = hex(j + t)
        t += 1
      }
      set.add(mn)
      j += 1
    }
    val out = new Array[Any](set.size())
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  def column(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowFps(GraftBridge.expression(text), k, w))
}
