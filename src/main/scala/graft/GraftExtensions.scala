package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.{CardSketch, FloatVecDot, MortonCode}
import graft.plans.{TopKStrategy, WindowTopKRewrite}

/** Session-extension entry point: registers the engine's custom
  * functions and planner strategy at session build time —
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * }}}
  *
  * or via `spark.sql.extensions=graft.GraftExtensions`. Runtime
  * registration (VectorFunctions.register / CardSketch.register /
  * TopK.register) remains available for sessions built elsewhere, e.g.
  * the driver-owned Verify/Bench sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[FloatVecDot].getName, "vec_dot"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          FloatVecDot(exprs(0), exprs(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("card_sketch"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CardSketch].getName, "card_sketch"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          CardSketch(exprs.head).toAggregateExpression()))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("morton"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[MortonCode].getName, "morton"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          MortonCode(exprs(0), exprs(1))))
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectOptimizerRule(_ => WindowTopKRewrite)
  }
}
