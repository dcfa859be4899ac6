package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native cosine-argmax over a centroid array — [[CodebookArgmin]]'s
  * IVF twin: given centroids `array<struct<cell_id:long,
  * cv:array<double>>>` and a vector `array<double>`, return the
  * cell_id maximizing `round(cosine(vec, cv), 6)` under a
  * strictly-greater fold (init −2.0, so ties keep the FIRST/lowest
  * cell in the array order, and an all-NaN scan yields the −1
  * sentinel) — exactly the replaced higher-order fold's semantics.
  * Cosine matches [[CosineSim]]: min-length zip, sequential
  * accumulation, 0.0 on a zero-norm side; the round-6 is Spark's own
  * BigDecimal HALF_UP. Every cell-assignment oracle replays
  * unchanged.
  */
case class CentroidArgmax(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "centroid_argmax"

  override def nullSafeEval(centA: Any, vA: Any): Any = {
    val cent = centA.asInstanceOf[ArrayData]
    val v = vA.asInstanceOf[ArrayData]
    var best = -2.0
    var bestCell = -1L
    val n = cent.numElements()
    var i = 0
    while (i < n) {
      val s = cent.getStruct(i, 2)
      val cv = s.getArray(1)
      val dim = math.min(v.numElements(), cv.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      while (j < dim) {
        val x = v.getDouble(j); val y = cv.getDouble(j)
        dot += x * y; na += x * x; nb += y * y; j += 1
      }
      val cos = if (na == 0.0 || nb == 0.0) 0.0
        else dot / (math.sqrt(na) * math.sqrt(nb))
      // NaN passthrough, as Spark's round() does — see CodebookArgmin
      val r = if (java.lang.Double.isNaN(cos) || java.lang.Double.isInfinite(cos)) cos
        else java.math.BigDecimal.valueOf(cos)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      if (r > best) { best = r; bestCell = s.getLong(0) }
      i += 1
    }
    bestCell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cent, v) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val dim = ctx.freshName("dim")
      val s = ctx.freshName("s"); val cv = ctx.freshName("cv")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val cos = ctx.freshName("cos")
      val r = ctx.freshName("r")
      val best = ctx.freshName("best"); val bestCell = ctx.freshName("bestCell")
      s"""
         |double $best = -2.0;
         |long $bestCell = -1L;
         |int $n = $cent.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  InternalRow $s = $cent.getStruct($i, 2);
         |  ArrayData $cv = $s.getArray(1);
         |  int $dim = java.lang.Math.min($v.numElements(), $cv.numElements());
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    double $x = $v.getDouble($j);
         |    double $y = $cv.getDouble($j);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  double $cos = ($na == 0.0 || $nb == 0.0) ? 0.0 :
         |    $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  double $r = $cos;
         |  if (!Double.isNaN($r) && !Double.isInfinite($r)) {
         |    $r = java.math.BigDecimal.valueOf($r)
         |      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |  }
         |  if ($r > $best) { $best = $r; $bestCell = $s.getLong(0); }
         |}
         |${ev.value} = $bestCell;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CentroidArgmax {
  def column(centArr: Column, vec: Column): Column =
    // explicit element cast: embeddings store array<float>, and
    // getDouble on a float ArrayData corrupts silently
    GraftBridge.column(CentroidArgmax(
      GraftBridge.expression(centArr),
      GraftBridge.expression(vec.cast("array<double>"))))
}
