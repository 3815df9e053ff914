package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL exposure of the graft expressions (SURVEY §4.2-2: "Registered via
  * FunctionRegistry for SQL exposure"): after registration,
  * `SELECT vec_squared_l2(a, b)` / `vec_dot` / `vec_cosine` work in
  * `spark.sql(...)` and are available to any SQL-only client of the session.
  *
  * Two hookup paths:
  *  - [[GraftFunctions.register]] on a live session, or
  *  - `spark.sql.extensions=graft.expr.GraftSparkExtensions` at session
  *    build time (the SparkSessionExtensions route).
  */
object GraftFunctions {

  private val fns: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("vec_squared_l2", 2, args => SquaredL2(args(0), args(1))),
    ("vec_dot", 2, args => DotProduct(args(0), args(1))),
    ("vec_cosine", 2, args => CosineSim(args(0), args(1))),
    ("vec_avg", 1, args => VectorAvg(args(0))))

  private def checked(name: String, arity: Int,
                      builder: Seq[Expression] => Expression)(args: Seq[Expression]): Expression = {
    require(args.length == arity, s"$name expects $arity argument(s), got ${args.length}")
    builder(args)
  }

  def register(spark: SparkSession): Unit = fns.foreach { case (name, arity, builder) =>
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft.expr", name),
      checked(name, arity, builder) _)
  }

  private[expr] def inject(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, arity, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.expr", name),
        checked(name, arity, builder) _))
    }
}

/** `--conf spark.sql.extensions=graft.expr.GraftSparkExtensions` */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
