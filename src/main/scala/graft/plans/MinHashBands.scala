package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash + LSH banding over an `array<string>` shingle column:
  * returns `array<long>` of length `bands`, element b = a 64-bit
  * combination of that band's `rows` min-hashes. Docs sharing any band
  * value are near-dup candidates (the classic banding scheme).
  *
  * Why native: the HOF formulation (`bands*rows` separate
  * `array_min(transform(sh, …))` columns) re-evaluates the shingle
  * expression once per hash function after Catalyst collapses the
  * projections — at 16 hashes that made the LSH stage ~16× the cost of
  * the corpus scan. Here each shingle is hashed exactly once (FNV-1a 64)
  * and the k derived hashes are one xor+multiply mix each, fused into a
  * single codegen loop.
  */
case class MinHashBands(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  // tokens/shingles must be array<string>; declared so SQL misuse
  // fails (or casts) at analysis time, not via runtime ClassCast
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = bands * rows
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = SimHash64.fnv1a64(arr.getUTF8String(i))
        var j = 0
        while (j < k) {
          val h = MinHashBands.mix64(base ^ (j * MinHashBands.Gamma))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0xcbf29ce484222325L
      var r = 0
      while (r < rows) {
        acc = (acc ^ mins(b * rows + r)) * 0x100000001b3L
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val k = bands * rows
      val mins = ctx.freshName("mins"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val b = ctx.freshName("b"); val r = ctx.freshName("r")
      val base = ctx.freshName("base"); val h = ctx.freshName("h")
      val acc = ctx.freshName("acc"); val n = ctx.freshName("n")
      val simCls = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val mhCls = MinHashBands.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $base = $simCls.fnv1a64($a.getUTF8String($i));
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $h = $mhCls.mix64($base ^ ($j * ${MinHashBands.Gamma}L));
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |}
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $acc = 0xcbf29ce484222325L;
         |  for (int $r = 0; $r < $rows; $r++) {
         |    $acc = ($acc ^ $mins[$b * $rows + $r]) * 0x100000001b3L;
         |  }
         |  $out[$b] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashBands {
  /** 2^64 / phi — the splitmix64 increment; spreads the per-function
    * seed across the hash space. */
  val Gamma: Long = 0x9e3779b97f4a7c15L

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def column(shingles: Column, bands: Int, rows: Int): Column =
    GraftBridge.column(
      MinHashBands(GraftBridge.expression(shingles), bands, rows))
}
