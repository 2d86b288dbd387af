package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Public library facade for hierarchy flattening over ARBITRARY
  * caller (node, parent) DataFrames, delegating to the pointer-
  * jumping path behind the oracle-checked `hr_tree_rollup` query.
  */
object Trees {

  /** (node, root, depth) for every node of a parent-pointer forest.
    * Roots must point at themselves (parent == node). Pointer
    * jumping: ceil(log2(depth+1)) self-join rounds instead of a
    * depth-long sequential walk — the recursive-CTE workload in
    * cluster shape. */
  def flatten(parents: DataFrame, nodeCol: String = "node",
              parentCol: String = "parent"): DataFrame = {
    val in = parents.select(col(nodeCol).as("node"),
      col(parentCol).as("parent"))
    // pointer-jumping rounds are checkpoint-backed → memoized per
    // (session, input plan) — the graft.api.Graphs serving contract
    graft.sources.Materialize.resultOnce("trees.flatten", "", Seq(in))(
      graft.operators.Hierarchy.flatten(in))
  }
}
