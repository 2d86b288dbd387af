package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Idempotent temp-function registration: register once per session and
  * skip thereafter, so repeated `register` calls (every operator entry
  * point guards its own dependencies) don't spam
  * `SimpleFunctionRegistry: The function X replaced ...` warnings. */
object Registry {
  def registerOnce(spark: SparkSession, name: String,
                   builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name))) {
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
