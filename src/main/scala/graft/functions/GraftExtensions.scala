package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library entry point for Catalyst extension injection (SURVEY
  * §2.11): `spark.sql.extensions=graft.functions.GraftExtensions`
  * makes the engine's custom expressions available to pure-SQL users
  * on any session of the application — the standard way a Spark
  * library ships custom functions, vs the per-session temp-function
  * registration `ArrayDot.register` offers for programmatic use.
  *
  * Only `array_dot` needs injection today: every other operator in
  * the engine is expressible with built-in functions or the
  * DataFrame API (deliberately — custom plan nodes are a last
  * resort, see COVERAGE.md §2.11).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getCanonicalName, "array_dot"),
      (exprs: Seq[Expression]) => {
        // Spark does not validate arity from ExpressionInfo — without
        // this, array_dot(a,b,c) would silently drop c
        require(exprs.length == 2,
          s"array_dot requires exactly 2 arguments, got ${exprs.length}")
        ArrayDot(exprs.head, exprs(1))
      }))
  }
}
