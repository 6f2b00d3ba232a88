package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.expressions.DotProduct

/** Catalyst extension point: registers graft's native expressions so SQL and
  * DataFrame plans can call them (`SELECT graft_dot(a, b)`).
  *
  * Two entry paths:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the standard SparkSessionExtensions injection);
  *  - [[GraftExtensions.register]] on a live session (idempotent) — used by
  *    the query registry so the driver's vanilla session gets the functions
  *    without special configuration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.dotFn)
}

object GraftExtensions {
  private val dotFn = (
    FunctionIdentifier("graft_dot"),
    DotProduct.info,
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "graft_dot takes exactly 2 arguments")
      DotProduct(children(0), children(1))
    })

  /** Idempotent on-session registration. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(dotFn._1)) {
      registry.registerFunction(dotFn._1, dotFn._2, dotFn._3)
    }
  }
}
