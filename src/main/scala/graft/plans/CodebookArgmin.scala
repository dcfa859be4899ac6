package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native argmin-over-codebook for PQ/IVF training and encode: given a
  * codebook `array<struct<cid:long, cv:array<double>, cc:double>>` and
  * a subvector `array<double>`, return the cid minimizing
  * `round(cc − 2·⟨x,cv⟩, 6)` — strictly-less fold, so ties keep the
  * FIRST (lowest-cid, the codebook is built in cid order) and a
  * NaN/absent minimum yields the −1 sentinel, exactly the semantics of
  * the higher-order `aggregate` fold this replaces.
  *
  * Why an expression: the HOF form pays per-element lambda dispatch ×
  * nCents centroids × m subspaces × every corpus row — measured as the
  * dominant cost of in-plan PQ training (r7 consolidated bench,
  * q_pq_ann 35 cpu s). This is one fused loop inside whole-stage
  * codegen. The arithmetic is bit-identical: sequential left-fold dot
  * (same IEEE op order as `VectorFns.dot`) and Spark's own
  * BigDecimal-HALF_UP round-6 — so every training/encode oracle
  * replays unchanged.
  */
case class CodebookArgmin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "codebook_argmin"

  override def nullSafeEval(cbA: Any, svA: Any): Any = {
    val cb = cbA.asInstanceOf[ArrayData]
    val sv = svA.asInstanceOf[ArrayData]
    var best = Double.MaxValue
    var bestCid = -1L
    val n = cb.numElements()
    var i = 0
    while (i < n) {
      val s = cb.getStruct(i, 3)
      val cv = s.getArray(1)
      val dim = math.min(sv.numElements(), cv.numElements())
      var dot = 0.0
      var j = 0
      while (j < dim) { dot += sv.getDouble(j) * cv.getDouble(j); j += 1 }
      // Spark's round() passes NaN/Infinity through untouched
      // (BigDecimal.valueOf would throw on them) — so a NaN distance
      // compares false and the -1 sentinel survives for the callers'
      // designed corrupt-vector error paths (review r7 #2)
      val raw = s.getDouble(2) - 2.0 * dot
      val d = if (java.lang.Double.isNaN(raw) || java.lang.Double.isInfinite(raw)) raw
        else java.math.BigDecimal.valueOf(raw)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      if (d < best) { best = d; bestCid = s.getLong(0) }
      i += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cb, sv) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val dim = ctx.freshName("dim")
      val s = ctx.freshName("s"); val cv = ctx.freshName("cv")
      val dot = ctx.freshName("dot"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestCid = ctx.freshName("bestCid")
      s"""
         |double $best = Double.MAX_VALUE;
         |long $bestCid = -1L;
         |int $n = $cb.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  InternalRow $s = $cb.getStruct($i, 3);
         |  ArrayData $cv = $s.getArray(1);
         |  int $dim = java.lang.Math.min($sv.numElements(), $cv.numElements());
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    $dot += $sv.getDouble($j) * $cv.getDouble($j);
         |  }
         |  double $d = $s.getDouble(2) - 2.0 * $dot;
         |  if (!Double.isNaN($d) && !Double.isInfinite($d)) {
         |    $d = java.math.BigDecimal.valueOf($d)
         |      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |  }
         |  if ($d < $best) { $best = $d; $bestCid = $s.getLong(0); }
         |}
         |${ev.value} = $bestCid;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CodebookArgmin {
  def column(cbArr: Column, subV: Column): Column =
    // explicit element cast: callers pass slices of already-cast
    // arrays today, but a float input would corrupt silently
    GraftBridge.column(CodebookArgmin(
      GraftBridge.expression(cbArr),
      GraftBridge.expression(subV.cast("array<double>"))))
}
