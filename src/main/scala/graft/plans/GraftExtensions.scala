package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{Decimal, DoubleType}
import graft.functions.{DotExpr, MinHashSketchExpr, NormExpr, PipExpr, QuantileSketchAgg, ShingleHashesExpr}

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
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "built-in")

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
  )

  /** Register on an already-built session (temp-function registry). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      Bridge.registerFunction(spark, id, inf, builder)
    }
}
