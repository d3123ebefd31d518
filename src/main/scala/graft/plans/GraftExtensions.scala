package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.call_function

/** SparkSessionExtensions hook: registers the engine's native expressions
  * as SQL functions, so `spark.sql("SELECT business_seconds(a, b)")` works
  * with `spark.sql.extensions=graft.plans.GraftExtensions` (or by calling
  * [[GraftExtensions.register]] on an existing session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("business_seconds"),
      BusinessSeconds.info,
      (children: Seq[Expression]) => {
        require(children.length == 2, "business_seconds(start, end) takes 2 arguments")
        BusinessSeconds(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("snake_case"),
      SnakeCase.info,
      (children: Seq[Expression]) => {
        require(children.length == 1, "snake_case(str) takes 1 argument")
        SnakeCase(children.head)
      }))
  }
}

object GraftExtensions {
  /** Column-API form (requires [[register]] or the extensions conf). */
  def businessSecondsExpr(start: Column, end: Column): Column =
    call_function("business_seconds", start, end)

  /** Column-API form of the native one-pass snake_case. */
  def snakeCaseExpr(c: Column): Column = call_function("snake_case", c)

  /** Register the SQL functions on an already-built session (idempotent —
    * repeated calls from query constructors don't re-replace builders).
    */
  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(FunctionIdentifier("snake_case"))) return
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("business_seconds"),
      BusinessSeconds.info,
      (children: Seq[Expression]) => {
        require(children.length == 2, "business_seconds(start, end) takes 2 arguments")
        BusinessSeconds(children.head, children(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("snake_case"),
      SnakeCase.info,
      (children: Seq[Expression]) => {
        require(children.length == 1, "snake_case(str) takes 1 argument")
        SnakeCase(children.head)
      })
  }
}
