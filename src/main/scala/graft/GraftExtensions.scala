package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.plans.{BoundedTopK, CosineSim, MinHashBands, SimHash64, WinnowFps}

/** SQL surface for the engine's custom Catalyst expressions.
  *
  * Register with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `withExtensions`) and the operators become callable from plain
  * `spark.sql(...)` — the library's column API and its SQL API expose
  * the same native expressions, so a SQL user pays no UDF penalty:
  *
  * {{{
  *   SELECT simhash64(tokens),
  *          cosine_sim(a, b),
  *          top_k(score, id, 5)
  *   ...
  *   WHERE hash_keep(doc_id, 0.1D, 'holdout')  -- deterministic sample
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "simhash64(tokens: array<string>)")
        SimHash64(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands"),
      (args: Seq[Expression]) => {
        require(args.size == 3,
          "minhash_bands(shingles: array<string>, bands: int, rows: int)")
        MinHashBands(args.head,
          intArg(args(1), "minhash_bands", 1), intArg(args(2), "minhash_bands", 2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "cosine_sim(a: array<float>, b: array<float>)")
        CosineSim(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("top_k"),
      new ExpressionInfo(classOf[BoundedTopK].getName, "top_k"),
      (args: Seq[Expression]) => {
        require(args.size == 3, "top_k(score: double, id: bigint, k: int)")
        BoundedTopK(args.head, args(1), intArg(args(2), "top_k", 2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
      (args: Seq[Expression]) => {
        require(args.size == 3, "winnow_fps(text: string, k: int, w: int)")
        WinnowFps(args.head,
          intArg(args(1), "winnow_fps", 1), intArg(args(2), "winnow_fps", 2))
      }))
    // deterministic data-keyed sampling predicate for SQL users —
    // the same md5-threshold membership as Sampling.hashKeep, so a
    // SQL WHERE clause and the column API select identical rows
    ext.injectFunction((
      new FunctionIdentifier("hash_keep"),
      new ExpressionInfo("graft.operators.Sampling", "hash_keep"),
      (args: Seq[Expression]) => {
        require(args.size == 3,
          "hash_keep(key, fraction: double literal, seed: string literal)")
        // Spark SQL parses an unsuffixed 0.1 as DECIMAL(1,1), so accept
        // decimal/float literals too — requiring the 0.1D suffix was a
        // usability trap (ADVICE r5).
        val frac = args(1) match {
          case Literal(d: Double, org.apache.spark.sql.types.DoubleType) => d
          case Literal(f: Float, org.apache.spark.sql.types.FloatType) => f.toDouble
          case Literal(d: org.apache.spark.sql.types.Decimal,
              _: org.apache.spark.sql.types.DecimalType) => d.toDouble
          // the boundary fractions are naturally written as 0 / 1
          case Literal(i: Int, org.apache.spark.sql.types.IntegerType) => i.toDouble
          case Literal(l: Long, org.apache.spark.sql.types.LongType) => l.toDouble
          case other => throw new IllegalArgumentException(
            s"hash_keep: fraction must be a numeric literal, got $other")
        }
        // same contract as Sampling.hashKeep — out-of-range fractions
        // fail loudly instead of silently degenerating to TRUE/FALSE
        require(frac >= 0.0 && frac <= 1.0,
          s"hash_keep: fraction must be in [0, 1], got $frac")
        val seed = args(2) match {
          case Literal(s, org.apache.spark.sql.types.StringType) if s != null =>
            s.toString
          case other => throw new IllegalArgumentException(
            s"hash_keep: seed must be a string literal, got $other")
        }
        // built from raw Catalyst nodes: a functions-API Column wraps
        // ColumnNodes that do not survive the function-builder path
        import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, LessThan, Md5, Substring}
        import org.apache.spark.sql.types.StringType
        val cut = math.round(frac * (1L << 48))
        if (cut <= 0L) Literal.FalseLiteral
        else if (cut >= (1L << 48)) Literal.TrueLiteral
        else LessThan(
          Substring(
            Md5(Cast(Concat(Seq(Literal(seed),
              Cast(args.head, StringType))), org.apache.spark.sql.types.BinaryType)),
            Literal(1), Literal(12)),
          Literal(graft.operators.Sampling.thresholdHex(frac)))
      }))
  }
}
