package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over an `array<string>` token column.
  *
  * Classic Charikar scheme: each token hashes to 64 bits; bit b of the
  * fingerprint is 1 iff the signed sum of (+1 for set / -1 for clear)
  * across token OCCURRENCES is positive (a tied vote is 0).
  *
  * ENGINE-REPLAYABLE token hash (the [[WinnowFps]] trick): the 64 bits
  * are the first 16 hex chars of md5(token) read as a big-endian
  * integer — bit p of the hash is bit (p mod 4) of hex digit
  * (15 − p div 4), so an external SQL engine replays the whole
  * fingerprint with md5 + per-digit integer arithmetic, no
  * engine-private hash function. (The earlier FNV-1a hash was cheaper
  * per token but unreplayable, which kept the simhash queries outside
  * the hash-compare oracle; one MD5 per token occurrence is the price
  * of a real correctness row, and it is the same digest the winnowing
  * sketch already pays per k-gram.)
  *
  * A 64-counter inner loop is imperative by nature — exactly the case
  * where a native expression (with codegen) beats both HOF chains and
  * UDFs (SURVEY.md §4.2).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  // tokens/shingles must be array<string>; declared so SQL misuse
  // fails (or casts) at analysis time, not via runtime ClassCast
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"${SimHash64.getClass.getName.stripSuffix("$")}$$.MODULE$$.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** md5(s)'s first 8 digest bytes as a big-endian 64-bit value — the
    * integer behind the first 16 hex chars of the md5 hex string. */
  def md5Hash64(md: java.security.MessageDigest, s: UTF8String): Long = {
    md.reset()
    md.update(s.getBytes)
    val d = md.digest()
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** One digest per thread, not one per row (review r7 — same fix as
    * MinHashBands). */
  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** The fingerprint for one token array; shared by eval and codegen. */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val md = Md5.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = md5Hash64(md, arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def column(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))

  /** Hamming distance between two fingerprints as a column. */
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
