package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{Decimal, DoubleType}
import graft.functions.{BottomKPairsAgg, CmsSketchAgg, DotExpr, MinHashSketchExpr, NfcNormExpr, NormExpr, PipExpr, QuantileSketchAgg, ShingleHashesExpr, SqDistFDExpr, TopKItemsAgg}

/** SQL surface for graft's native expressions. Install at session build
  * with `.withExtensions(new GraftExtensions)` / the
  * `spark.sql.extensions` conf, or on a live session with
  * `GraftExtensions.register(spark)`. Then:
  *
  * {{{
  *   SELECT pip(x, y, xs, ys)        -- point-in-polygon
  *   SELECT vec_dot(a, b), vec_norm(a)
  *   SELECT minhash_sketch(tokens), shingle_hashes(tokens)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // literal-rectangle point-in-polygon → pushdown-able range predicates
    ext.injectOptimizerRule(_ => RectPipRule)
    // physical planning for the native top-k-per-group operator
    ext.injectPlannerStrategy(_ => TopKStrategy)
    // SQL DELETE/UPDATE/MERGE onto versioned snapshot tables
    ext.injectPlannerStrategy(_ => SnapshotDmlStrategy)
    // VACUUM / OPTIMIZE / RESTORE / DESCRIBE HISTORY verbs
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "built-in")

  /** Evaluate a parameter that sizes an aggregation buffer — it must be
    * a literal (foldable-check first: eval(null) on a column reference
    * throws an unbound-attribute error instead of a usable message). */
  private def litInt(e: Expression, fn: String): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: expected an integer literal, got non-literal ${e.sql}")
    e.eval(null) match {
      // fractional literals are rejected, not truncated: topk_items(w, 2.5)
      // silently becoming k=2 would hand back a different result set than
      // the user asked for with no diagnostic
      case d: java.lang.Double if d.doubleValue() != math.floor(d.doubleValue()) =>
        throw new IllegalArgumentException(
          s"$fn: expected an integer literal, got non-integral $d")
      case d: Decimal if !d.toBigDecimal.isWhole =>
        throw new IllegalArgumentException(
          s"$fn: expected an integer literal, got non-integral $d")
      case f: java.lang.Float if f.floatValue() != math.floor(f.floatValue()) =>
        throw new IllegalArgumentException(
          s"$fn: expected an integer literal, got non-integral $f")
      // range-check through longValue BEFORE narrowing: intValue() wraps
      // (topk_items(w, 2^32+1) would silently become k=1 — the same
      // silent-truncation class as the fractional cases above)
      case n: java.lang.Number
          if n.longValue() > Int.MaxValue || n.longValue() < Int.MinValue =>
        throw new IllegalArgumentException(
          s"$fn: integer literal out of Int range: $n")
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: expected an integer literal, got $other")
    }
  }

  /** Size parameters must be usable: a k < 1 (or a capacity below k)
    * reaches the aggregate's buffer allocation as a nonsense size —
    * reject at registration with the SQL-surface function name. */
  private def litPos(e: Expression, fn: String, what: String): Int = {
    val v = litInt(e, fn)
    if (v < 1) throw new IllegalArgumentException(s"$fn: $what must be >= 1, got $v")
    v
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("pip"),
      info("pip", "pip(px, py, xs, ys) - ray-casting point-in-polygon test"),
      (args: Seq[Expression]) => PipExpr(args(0), args(1), args(2), args(3))),
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - float-vector dot product in double"),
      (args: Seq[Expression]) => DotExpr(args(0), args(1))),
    (FunctionIdentifier("vec_norm"),
      info("vec_norm", "vec_norm(a) - float-vector L2 norm"),
      (args: Seq[Expression]) => NormExpr(args(0))),
    (FunctionIdentifier("nfc_norm"),
      info("nfc_norm", "nfc_norm(s) - unicode NFC + control strip + whitespace collapse/trim"),
      (args: Seq[Expression]) => NfcNormExpr(args(0))),
    (FunctionIdentifier("minhash_sketch"),
      info("minhash_sketch", "minhash_sketch(tokens) - 16 minhashes + distinct-shingle count"),
      (args: Seq[Expression]) => MinHashSketchExpr(args(0))),
    (FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(tokens) - distinct word-bigram murmur3 hashes"),
      (args: Seq[Expression]) => ShingleHashesExpr(args(0))),
    (FunctionIdentifier("quantile_sketch"),
      info("quantile_sketch",
        "quantile_sketch(x, q, ...) - mergeable log-bucket quantile sketch, 1% relative error, " +
          "bit-identical under any partitioning; returns one estimate per requested q"),
      (args: Seq[Expression]) => {
        // quantile args must be literals (they parameterize the buffer);
        // foldable-check first — eval(null) on e.g. a column reference
        // throws an unbound-attribute error instead of a usable message
        args.tail.find(!_.foldable).foreach { e =>
          throw new IllegalArgumentException(
            s"quantile_sketch: quantile args must be numeric literals, got non-literal ${e.sql}")
        }
        val qs = args.tail.map(_.eval(null) match {
          case d: java.lang.Double => d.doubleValue()
          case d: Decimal          => d.toDouble
          case n: java.lang.Number => n.doubleValue()
          case other => throw new IllegalArgumentException(
            s"quantile_sketch: quantile args must be numeric literals, got $other")
        })
        // bare AggregateFunction: the analyzer wraps it in AggregateExpression
        QuantileSketchAgg(Cast(args.head, DoubleType), qs)
      }),
    (FunctionIdentifier("vec_sqdist"),
      info("vec_sqdist",
        "vec_sqdist(a, b) - squared L2 distance: FLOAT-array a (stored vectors) vs " +
          "DOUBLE-array b (query/codebook), accumulated in double"),
      (args: Seq[Expression]) => SqDistFDExpr(args(0), args(1))),
    (FunctionIdentifier("topk_items"),
      info("topk_items",
        "topk_items(item, k[, capacity]) - SpaceSaving heavy hitters: top-k (item, cnt) " +
          "structs, exact while distinct items <= capacity (default 1024), " +
          "eps-approximate at bounded memory beyond"),
      (args: Seq[Expression]) => {
        val k = litPos(args(1), "topk_items", "k")
        val cap = if (args.length > 2) litPos(args(2), "topk_items", "capacity") else 1024
        if (cap < k) throw new IllegalArgumentException(
          s"topk_items: capacity ($cap) must be >= k ($k)")
        TopKItemsAgg(args(0), k, cap)
      }),
    (FunctionIdentifier("bottom_k"),
      info("bottom_k",
        "bottom_k(key, id, k) - the k smallest (key, id) pairs under (key asc, id asc); " +
          "mergeable k-bounded state (map-side combine, no sort)"),
      (args: Seq[Expression]) => BottomKPairsAgg(Cast(args(0), DoubleType),
        Cast(args(1), org.apache.spark.sql.types.LongType),
        litPos(args(2), "bottom_k", "k"))),
    (FunctionIdentifier("cms_sketch"),
      info("cms_sketch",
        "cms_sketch(item) - Count-Min counter grid (depth x width flat array); " +
          "merge = counter addition; estimate = min over rows"),
      (args: Seq[Expression]) => CmsSketchAgg(args(0))),
  )

  /** Register on an already-built session (temp-function registry). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      Bridge.registerFunction(spark, id, inf, builder)
    }
}
