package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Idempotent-silent session registration for the native graft
  * functions. `FunctionRegistry.registerFunction` REPLACES an existing
  * entry with a "replaced a previously registered function" warning;
  * [[graft.GraftExtensions]] injects every graft function at session
  * build, so the explicit per-query `register(spark)` convenience calls
  * must be no-ops when the name is already bound — same builder either
  * way, so skipping is always safe. */
private[graft] object Registry {
  def ifAbsent(spark: SparkSession, name: String, info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit = {
    val id = FunctionIdentifier(name)
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
