package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Idempotent temp-function registration.
  *
  * The operators register their native expressions at query-build time, once
  * per invocation (the session is harness-built, so config-time registration
  * via GraftExtensions isn't available). `createOrReplaceTempFunction` logs a
  * `SimpleFunctionRegistry ... replaced a previously registered function`
  * warning on every call after the first — a full Bench pass re-registered
  * hundreds of times and the warning drowned the log tail. Checking
  * `functionExists` first keeps the call idempotent AND silent; registration
  * still happens exactly once per session.
  */
object Registration {
  def once(spark: SparkSession, name: String)(builder: Seq[Expression] => Expression): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier(name)))
      registry.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
